"""End-to-end pipeline tests against the reference's closed-form fixtures
(reference test/main.cpp:120-252)."""

import numpy as np
import pytest

import obj2voxel_tpu as o2v
from obj2voxel_tpu import constants as C
from obj2voxel_tpu.engine import TriangleSoup, voxelize_soup

from conftest import expected_unit_cube_voxels


def run_count(tris, resolution, pair_tile, **kw):
    soup = TriangleSoup.from_vertices(tris)
    total = 0
    seen = set()
    for xyz, argb in voxelize_soup(soup, resolution=resolution, pair_tile=pair_tile, **kw):
        assert xyz.shape[0] == argb.shape[0]
        assert np.all(xyz >= 0) and np.all(xyz < resolution)
        for row in xyz:
            key = tuple(row)
            assert key not in seen, f"duplicate voxel {key}"
            seen.add(key)
        total += xyz.shape[0]
    return total


def test_unit_cube_expected_voxel_count(cube_tris, pair_tile):
    r = 32
    assert run_count(cube_tris, r, pair_tile) == expected_unit_cube_voxels(r)


def test_unit_cube_expected_voxel_count_r64(cube_tris, pair_tile):
    r = 64
    assert run_count(cube_tris, r, pair_tile) == expected_unit_cube_voxels(r)


def test_unit_cube_multiple_chunks(cube_tris, pair_tile):
    # resolution = 2 * chunk size, the reference's chunk-boundary regression
    # test (test/main.cpp:194-208)
    r = 2 * C.CHUNK_SIZE
    assert run_count(cube_tris, r, pair_tile) == expected_unit_cube_voxels(r)


def test_three_planes_expected_voxel_count(planes_tris, pair_tile):
    r = 32
    assert run_count(planes_tris, r, pair_tile) == 3 * r * r


def test_three_planes_multiple_chunks(planes_tris, pair_tile):
    # exercises an exactly-boundary-aligned plane (x lands on 64.0 at r=128)
    r = 2 * C.CHUNK_SIZE
    assert run_count(planes_tris, r, pair_tile) == 3 * r * r


def test_blend_strategy_same_occupancy(cube_tris, pair_tile):
    r = 32
    n_max = run_count(cube_tris, r, pair_tile, strategy=C.MAX_STRATEGY)
    n_blend = run_count(cube_tris, r, pair_tile, strategy=C.BLEND_STRATEGY)
    assert n_max == n_blend == expected_unit_cube_voxels(r)


def test_supersampling_produces_voxels(cube_tris, pair_tile):
    r = 16
    n = run_count(cube_tris, r, pair_tile, supersampling=2)
    base = expected_unit_cube_voxels(r)
    # supersampling "usually produces slightly more voxels" (README.adoc:153-162)
    assert base <= n <= 3 * base
    # all coordinates in output resolution
    soup = TriangleSoup.from_vertices(cube_tris)
    for xyz, _ in voxelize_soup(soup, resolution=r, supersampling=2, pair_tile=pair_tile):
        assert np.all(xyz < r)


def test_unit_transform_flip(cube_tris, pair_tile):
    # axis flips must not change the voxel count of a symmetric model
    r = 32
    flip_y = [1, 0, 0, 0, -1, 0, 0, 0, 1]
    n = run_count(cube_tris, r, pair_tile, unit_transform=flip_y)
    assert n == expected_unit_cube_voxels(r)


def test_permutation_swap(pair_tile):
    # a single plane at z=0.5 permuted into a plane along another axis
    verts = np.array(
        [[0, 0, 0.5], [1, 0, 0.5], [1, 1, 0.5], [0, 0, 0.5], [1, 1, 0.5], [0, 1, 0.5]],
        np.float32,
    ).reshape(-1, 3, 3)
    r = 16
    soup = TriangleSoup.from_vertices(verts)
    # bounds of the flat plane are degenerate in z; give it a tiny box
    bounds = (np.zeros(3, np.float32), np.ones(3, np.float32))
    base = {
        tuple(v)
        for xyz, _ in voxelize_soup(
            soup, resolution=r, pair_tile=pair_tile, bounds=bounds
        )
        for v in xyz
    }
    perm = [1, 0, 0, 0, 0, 1, 0, 1, 0]  # swap y and z
    swapped = {
        tuple(v)
        for xyz, _ in voxelize_soup(
            soup, resolution=r, pair_tile=pair_tile, bounds=bounds, unit_transform=perm
        )
        for v in xyz
    }
    assert base == {(x, z, y) for (x, y, z) in swapped}


def test_multipass_host_merge(cube_tris):
    # force the host-merge fallback: many tiny passes per slab
    r = 32
    soup = TriangleSoup.from_vertices(cube_tris)
    total = 0
    seen = set()
    for xyz, argb in voxelize_soup(
        soup, resolution=r, pair_tile=1 << 12, max_pass_budget=1 << 12
    ):
        for row in xyz:
            key = tuple(row)
            assert key not in seen
            seen.add(key)
        total += xyz.shape[0]
    assert total == expected_unit_cube_voxels(r)


def test_empty_mesh():
    soup = TriangleSoup.empty()
    assert list(voxelize_soup(soup, resolution=8)) == []


def test_memory_output_byte_count(cube_tris, pair_tile):
    # VL32 output is 16 bytes per voxel (reference test/main.cpp:158-179)
    r = 32

    class Input:
        def __init__(self):
            self.i = 0

        def __call__(self, tri):
            if self.i >= len(cube_tris):
                return False
            tri.set_basic(cube_tris[self.i])
            self.i += 1
            return True

    inst = o2v.Instance()
    inst._pair_tile = pair_tile
    inst.set_input_callback(Input())
    inst.set_output_memory("vl32")
    inst.set_resolution(r)
    assert inst.voxelize() == C.ERR_OK
    data = inst.get_output_memory()
    assert data is not None
    assert len(data) == expected_unit_cube_voxels(r) * 16


def test_batched_dispatch_equivalence(monkeypatch):
    """O2V_BATCH_FORCE=1 (batched fused dispatches) == unbatched output.

    Voxel sets must match exactly; colors to ±1 byte (the batched and single
    programs contract float chains differently on CPU -- same tolerance as
    the fused-vs-XLA oracle in test_pass_fused.py)."""
    import obj2voxel_tpu.engine as eng

    # translated copies of one triangle, integer offsets: every row keeps the
    # same fractional grid alignment, so all rows land in ONE expand bucket
    # (one kernel compile) and slabs need several passes at budget 2^14
    rng = np.random.RandomState(7)
    base = np.array(
        [[0.2, 0.2, 0.3], [1.4, 0.3, 0.4], [0.3, 1.4, 1.3]], np.float32
    )
    offs = rng.randint(0, 60, size=(6000, 1, 3)).astype(np.float32)
    tris = base[None] + offs
    soup = TriangleSoup.from_vertices(tris.reshape(-1, 3, 3))
    bounds = (np.zeros(3, np.float32), np.full(3, 62.0, np.float32))

    def run():
        out = {}
        for xyz, argb in voxelize_soup(
            soup, resolution=64, pair_tile=1 << 14, bounds=bounds
        ):
            for row, c in zip(xyz, argb):
                out[tuple(row)] = int(c)
        return out

    monkeypatch.setenv("O2V_BATCH", "0")
    base_out = run()
    monkeypatch.setenv("O2V_BATCH", "8")
    monkeypatch.setenv("O2V_BATCH_FORCE", "1")
    batched_out = run()
    assert eng.WAVE_STATS["batched"] >= 2, eng.WAVE_STATS
    assert eng.WAVE_STATS["dispatches"] < eng.WAVE_STATS["passes"]

    assert set(base_out) == set(batched_out)
    db = np.abs(
        np.array(list(base_out.values()), np.int64).view(np.uint8).astype(np.int16)
        - np.array([batched_out[k] for k in base_out], np.int64)
        .view(np.uint8).astype(np.int16)
    )
    assert db.max() <= 1
