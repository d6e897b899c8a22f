"""Subdivision work-regularizer tests (reference voxelization.cpp:335-379)."""

import numpy as np

from obj2voxel_tpu.constants import SUBDIVISION_VOLUME_LIMIT
from obj2voxel_tpu.ops.subdivide import roughly_axis_aligned, subdivide_soup


def test_axis_aligned_not_subdivided():
    # a huge axis-aligned triangle keeps its identity
    tri = np.array([[[0, 0, 0.5], [100, 0, 0.5], [0, 100, 0.5]]], np.float32)
    uv = np.zeros((1, 3, 2), np.float32)
    v, u, idx = subdivide_soup(tri, uv)
    assert v.shape[0] == 1
    assert np.array_equal(idx, [0])


def test_diagonal_triangle_subdivided_below_limit():
    tri = np.array([[[0, 0, 0], [60, 60, 60], [0, 60, 60]]], np.float32)
    uv = np.random.RandomState(0).rand(1, 3, 2).astype(np.float32)
    v, u, idx = subdivide_soup(tri, uv)
    assert v.shape[0] > 1
    assert np.all(idx == 0)
    # every piece below the volume limit
    vmin = np.floor(v.min(axis=1))
    vmax = np.floor(v.max(axis=1)) + 1
    vols = np.prod(vmax - vmin, axis=1)
    assert np.all(vols < SUBDIVISION_VOLUME_LIMIT)
    # total area conserved
    def area(t):
        return 0.5 * np.linalg.norm(
            np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]), axis=1
        ).sum()
    assert np.isclose(area(v), area(tri), rtol=1e-4)


def test_roughly_axis_aligned():
    flat = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    diag = np.array([[[0, 0, 0], [1, 1, 0], [0, 1, 1]]], np.float32)
    assert roughly_axis_aligned(flat)[0]
    assert not roughly_axis_aligned(diag)[0]


def test_subdivision_preserves_metadata_mapping():
    tris = np.array(
        [
            [[0, 0, 0.5], [50, 0, 0.5], [0, 50, 0.5]],  # aligned, kept
            [[0, 0, 0], [40, 40, 40], [0, 40, 40]],  # diagonal, split
        ],
        np.float32,
    )
    uv = np.zeros((2, 3, 2), np.float32)
    v, u, idx = subdivide_soup(tris, uv)
    assert set(np.unique(idx)) == {0, 1}
    assert (idx == 0).sum() == 1  # the aligned one stays whole
