"""O2V_DEBUG invariant checks (reference VXIO_DEBUG_ASSERT analog)."""

import numpy as np
import pytest

import obj2voxel_tpu.utils.debug as dbg
from obj2voxel_tpu.engine import TriangleSoup, voxelize_soup

from conftest import (
    UNIT_CUBE_QUADS,
    UNIT_CUBE_VERTICES,
    expected_unit_cube_voxels,
    quads_to_tris,
)


def test_check_slab_output_passes_on_valid():
    xyz = np.array([[0, 0, 2], [1, 0, 2], [3, 3, 3]], np.int32)
    argb = np.full(3, 0xFF0000FF, np.uint32)
    dbg.check_slab_output(xyz, argb, 3, res_xy=4, z_extent=4, z_lo=2, z_hi=4)


@pytest.mark.parametrize(
    "xyz",
    [
        np.array([[0, 0, 1]], np.int32),  # z below the slab window
        np.array([[4, 0, 2]], np.int32),  # x outside the grid
        np.array([[0, -1, 2]], np.int32),  # negative coordinate
    ],
)
def test_check_slab_output_rejects_bad_coords(xyz):
    argb = np.full(1, 0xFF0000FF, np.uint32)
    with pytest.raises(dbg.DebugAssertionError):
        dbg.check_slab_output(xyz, argb, 1, res_xy=4, z_extent=4, z_lo=2, z_hi=4)


def test_check_slab_output_rejects_duplicates():
    xyz = np.array([[1, 1, 2], [1, 1, 2]], np.int32)
    argb = np.full(2, 0xFF0000FF, np.uint32)
    with pytest.raises(dbg.DebugAssertionError):
        dbg.check_slab_output(xyz, argb, 2, res_xy=4, z_extent=4, z_lo=2, z_hi=4)


def test_check_count():
    dbg.check_count(5, 8, "pass")
    with pytest.raises(dbg.DebugAssertionError):
        dbg.check_count(9, 8, "pass")
    with pytest.raises(dbg.DebugAssertionError):
        dbg.check_count(-1, 8, "pass")


def test_engine_runs_clean_under_debug(monkeypatch):
    """The real pipeline satisfies every debug invariant."""
    monkeypatch.setattr(dbg, "DEBUG", True)
    r = 16
    soup = TriangleSoup.from_vertices(
        quads_to_tris(UNIT_CUBE_VERTICES, UNIT_CUBE_QUADS)
    )
    total = sum(
        xyz.shape[0]
        for xyz, _ in voxelize_soup(soup, resolution=r, pair_tile=1 << 14)
    )
    assert total == expected_unit_cube_voxels(r)
