"""Transform and permutation math tests (reference obj2voxel.cpp:370-402,
main.cpp:224-262)."""

import numpy as np
import pytest

from obj2voxel_tpu.geometry import (
    compute_mesh_transform,
    mesh_bounds,
    parse_permutation,
)


def test_transform_maps_unit_cube_to_anti_bleed_range():
    t = compute_mesh_transform([0, 0, 0], [1, 1, 1], 32)
    lo = t.apply(np.zeros(3, np.float32))
    hi = t.apply(np.ones(3, np.float32))
    assert np.allclose(lo, 0.25)
    assert np.allclose(hi, 31.75)


def test_transform_preserves_aspect():
    # non-cubical model: the longest axis spans the grid, others stay centered
    t = compute_mesh_transform([0, 0, 0], [2, 1, 1], 64)
    lo = t.apply(np.array([0, 0, 0], np.float32))
    hi = t.apply(np.array([2, 1, 1], np.float32))
    assert np.allclose(lo[0], 0.25)
    assert np.allclose(hi[0], 63.75)
    # y/z span half the range
    assert np.allclose(hi[1] - lo[1], (63.75 - 0.25) / 2)


def test_transform_is_float32():
    t = compute_mesh_transform([0, 0, 0], [1, 1, 1], 128)
    assert t.matrix.dtype == np.float32
    assert t.translation.dtype == np.float32


def test_parse_permutation_identity():
    assert parse_permutation("xyz") == [1, 0, 0, 0, 1, 0, 0, 0, 1]


def test_parse_permutation_swap():
    assert parse_permutation("xzy") == [1, 0, 0, 0, 0, 1, 0, 1, 0]


def test_parse_permutation_flip():
    assert parse_permutation("xYz") == [1, 0, 0, 0, -1, 0, 0, 0, 1]


@pytest.mark.parametrize("bad", ["xy", "xxz", "abc", "xyzw", "xxy"])
def test_parse_permutation_invalid(bad):
    with pytest.raises(ValueError):
        parse_permutation(bad)


def test_mesh_bounds():
    tris = np.array(
        [[[0, -1, 2], [3, 4, 5], [-6, 7, 8]]], np.float32
    )
    lo, hi = mesh_bounds(tris)
    assert np.array_equal(lo, [-6, -1, 2])
    assert np.array_equal(hi, [3, 7, 8])
