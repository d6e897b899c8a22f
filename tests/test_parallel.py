"""Multi-device sharded voxelization on the virtual 8-device CPU mesh
(the analog of the reference's parallel worker tests, SURVEY.md section 4)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pytest

from obj2voxel_tpu.engine import TriangleSoup, voxelize_soup
from obj2voxel_tpu.parallel.mesh import voxelize_sharded

from conftest import (
    UNIT_CUBE_QUADS,
    UNIT_CUBE_VERTICES,
    expected_unit_cube_voxels,
    quads_to_tris,
)


@pytest.fixture(scope="module")
def cube_soup():
    return TriangleSoup.from_vertices(
        quads_to_tris(UNIT_CUBE_VERTICES, UNIT_CUBE_QUADS)
    )


def test_sharded_matches_expected_count(cube_soup):
    r = 16
    xyz, argb = voxelize_sharded(cube_soup, resolution=r, n_devices=8, tile_size=1 << 12)
    assert xyz.shape[0] == expected_unit_cube_voxels(r)
    assert argb.shape[0] == xyz.shape[0]
    # no duplicate voxels across device slabs
    keys = {tuple(v) for v in xyz}
    assert len(keys) == xyz.shape[0]


def test_sharded_matches_single_device(cube_soup, pair_tile):
    r = 16
    xyz_s, argb_s = voxelize_sharded(
        cube_soup, resolution=r, n_devices=8, tile_size=1 << 12
    )
    sharded = {tuple(v): int(c) for v, c in zip(xyz_s, argb_s)}

    single = {}
    for xyz, argb in voxelize_soup(cube_soup, resolution=r, pair_tile=pair_tile):
        for v, c in zip(xyz, argb):
            single[tuple(v)] = int(c)

    assert sharded == single


def test_sharded_odd_device_count(cube_soup):
    r = 16
    xyz, _ = voxelize_sharded(cube_soup, resolution=r, n_devices=3, tile_size=1 << 12)
    assert xyz.shape[0] == expected_unit_cube_voxels(r)


def test_sharded_large_mesh_matches_single_device(pair_tile):
    """>=100k-triangle mesh: the sharded path must produce the full voxel set
    (the round-1 path silently truncated work beyond one tile per device)."""
    from bench import make_sphere_mesh

    tris = make_sphere_mesh(100_000)
    soup = TriangleSoup.from_vertices(tris)
    r = 32

    xyz_s, argb_s = voxelize_sharded(
        soup, resolution=r, n_devices=8, pair_tile=pair_tile
    )
    sharded = {tuple(v): int(c) for v, c in zip(xyz_s, argb_s)}
    assert len(sharded) == xyz_s.shape[0]  # no duplicates across devices

    single = {}
    for xyz, argb in voxelize_soup(soup, resolution=r, pair_tile=pair_tile):
        for v, c in zip(xyz, argb):
            single[tuple(v)] = int(c)

    assert set(sharded) == set(single)
    # colors: identical combine semantics; MAX selections are bit-exact
    assert sharded == single


def _run_instance(soup, *, parallel, r=16, perm=None, bounds=None,
                  strategy=None, supersample=False, pair_tile=1 << 12):
    """Drive the PUBLIC API path (Instance.set_parallel -> voxelize) and
    return {(x,y,z): argb}."""
    from obj2voxel_tpu import constants as C
    from obj2voxel_tpu.api import Instance
    from obj2voxel_tpu.geometry import parse_permutation

    inst = Instance()
    inst.set_input_soup(soup)
    inst.set_resolution(r)
    inst.set_parallel(parallel)
    inst._pair_tile = pair_tile
    if perm is not None:
        inst.set_unit_transform(parse_permutation(perm))
    if bounds is not None:
        inst.set_mesh_boundaries(bounds)
    if strategy is not None:
        inst.set_color_strategy(strategy)
    if supersample:
        inst.set_supersampling(2)
    out = {}

    def sink(data, count):
        for row in np.asarray(data):
            out[tuple(int(v) for v in row[:3])] = int(row[3])
        return True

    inst.set_output_callback(sink)
    assert inst.voxelize() == 0
    return out


def test_instance_parallel_matches_single_chip(cube_soup):
    """The path users actually call: Instance.set_parallel(True) must produce
    the same voxels as the single-chip engine (VERDICT r2: the round-2 gate
    was statically dead and silently ran single-chip)."""
    par = _run_instance(cube_soup, parallel=True)
    ser = _run_instance(cube_soup, parallel=False)
    assert len(par) == expected_unit_cube_voxels(16)
    assert par == ser


def test_instance_parallel_with_permutation(cube_soup):
    """Permuted/flipped runs must go through the sharded path too (round-2
    voxelize_sharded had no unit_transform support)."""
    par = _run_instance(cube_soup, parallel=True, perm="zXy")
    ser = _run_instance(cube_soup, parallel=False, perm="zXy")
    assert par == ser and len(par) > 0


def test_instance_parallel_with_bounds(cube_soup):
    bounds = (-0.25, -0.25, -0.25, 1.25, 1.25, 1.25)
    par = _run_instance(cube_soup, parallel=True, bounds=bounds)
    ser = _run_instance(cube_soup, parallel=False, bounds=bounds)
    assert par == ser and len(par) > 0


def test_instance_parallel_blend_supersampled(cube_soup):
    from obj2voxel_tpu import constants as C

    par = _run_instance(
        cube_soup, parallel=True, strategy=C.BLEND_STRATEGY, supersample=True
    )
    ser = _run_instance(
        cube_soup, parallel=False, strategy=C.BLEND_STRATEGY, supersample=True
    )
    assert par == ser and len(par) > 0
