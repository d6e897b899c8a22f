"""Batched dataset-generation mode (BASELINE.json config 5)."""

import numpy as np

from obj2voxel_tpu.engine import TriangleSoup, densify, voxelize_batch

from conftest import (
    UNIT_CUBE_QUADS,
    UNIT_CUBE_VERTICES,
    expected_unit_cube_voxels,
    quads_to_tris,
)


def test_batch_of_cubes():
    cube = TriangleSoup.from_vertices(quads_to_tris(UNIT_CUBE_VERTICES, UNIT_CUBE_QUADS))
    # vary the mesh scale per batch element; normalization makes them identical
    soups = []
    for s in (1.0, 2.0, 0.5, 7.0):
        v = cube.verts * np.float32(s)
        soups.append(TriangleSoup.from_vertices(v))

    r = 16
    results = voxelize_batch(soups, resolution=r, pair_tile=1 << 14)
    assert len(results) == 4
    expected = expected_unit_cube_voxels(r)
    for xyz, argb in results:
        assert xyz.shape[0] == expected
        assert np.all(xyz >= 0) and np.all(xyz < r)
        assert argb.shape[0] == expected


def test_batch_with_empty_mesh():
    cube = TriangleSoup.from_vertices(quads_to_tris(UNIT_CUBE_VERTICES, UNIT_CUBE_QUADS))
    results = voxelize_batch(
        [cube, TriangleSoup.empty(), cube], resolution=8, pair_tile=1 << 12
    )
    assert results[1][0].shape[0] == 0
    assert results[0][0].shape[0] == results[2][0].shape[0] > 0


def test_densify():
    xyz = np.array([[0, 0, 0], [3, 2, 1]], np.int32)
    argb = np.array([0xFF112233, 0xFFAABBCC], np.uint32)
    grid = densify(xyz, argb, 4)
    assert grid.shape == (4, 4, 4)
    assert grid[0, 0, 0] == 0xFF112233
    assert grid[3, 2, 1] == 0xFFAABBCC
    assert (grid != 0).sum() == 2
