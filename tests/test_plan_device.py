"""Device planner (ops/plan_device.py) vs host planner (ops/plan.py).

The device plan must be BIT-IDENTICAL to the host plan: same segments, same
gather order (stable sort over the same (triangle, slab) incidence
enumeration).  This is the guarantee that lets the engine switch planners
per backend without changing output.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from obj2voxel_tpu.engine import build_tri_table, _pow2_at_least, _pad_tris
from obj2voxel_tpu.ops.plan import plan_mesh
from obj2voxel_tpu.ops.plan_device import plan_mesh_device


def _random_table(n, res, z_scale=1.0, seed=0):
    rng = np.random.RandomState(seed)
    verts = rng.uniform(0, res, size=(n, 3, 3)).astype(np.float32)
    verts[:, :, 2] *= z_scale
    # mix of tiny and large AABBs
    small = rng.rand(n) < 0.7
    verts[small, 1:, :] = verts[small, :1, :] + rng.uniform(
        -2, 2, size=(int(small.sum()), 2, 3)
    ).astype(np.float32)
    uvs = np.zeros((n, 3, 2), np.float32)
    types = np.full(n, 1, np.int32)
    rgb = np.ones((n, 3), np.float32)
    tex = np.full(n, -1, np.int32)
    return verts, uvs, types, rgb, tex


def _plans(n, res, z_extent, slot_budget, seed=0):
    verts, uvs, types, rgb, tex = _random_table(n, res, seed=seed)
    clamp_hi = np.array([res, res, z_extent], np.float32)
    vmin = np.clip(np.floor(verts.min(axis=1)), 0, clamp_hi).astype(np.int64)
    vmax = np.clip(np.floor(verts.max(axis=1)) + 1, 0, clamp_hi).astype(np.int64)

    n_pad = _pow2_at_least(n)
    padded = _pad_tris([verts, uvs, types, rgb, tex], n_pad)
    table = jnp.asarray(build_tri_table(*padded))

    host = plan_mesh(vmin, vmax, res, z_extent, slot_budget)
    dev = plan_mesh_device(table, n, res, z_extent, slot_budget)
    return host, dev


@pytest.mark.parametrize("slot_budget", [1 << 12, 1 << 16])
def test_device_plan_matches_host(slot_budget):
    (h_order, h_segs), (d_order, d_segs) = _plans(500, 64, 64, slot_budget, seed=1)
    assert d_order is not None
    assert d_segs == h_segs
    m = h_order.size
    np.testing.assert_array_equal(np.asarray(d_order)[:m], h_order)


def test_device_plan_multislab():
    # small budget -> several slabs; still identical
    (h_order, h_segs), (d_order, d_segs) = _plans(2000, 128, 128, 1 << 24, seed=2)
    assert d_order is not None
    assert d_segs == h_segs
    slabs = {(s.z_lo, s.z_hi) for s in h_segs}
    assert len(slabs) > 1
    np.testing.assert_array_equal(np.asarray(d_order)[: h_order.size], h_order)


def test_device_plan_falls_back_on_many_slabs():
    # force > MAX_DEVICE_SLABS slabs with a tiny budget over a tall grid
    verts, uvs, types, rgb, tex = _random_table(4000, 64, seed=3)
    z_extent = 4096
    verts[:, :, 2] = np.float32(z_extent) * np.random.RandomState(3).rand(
        verts.shape[0], 1
    ).astype(np.float32)
    n_pad = _pow2_at_least(verts.shape[0])
    padded = _pad_tris([verts, uvs, types, rgb, tex], n_pad)
    table = jnp.asarray(build_tri_table(*padded))
    # (None, None) signals "use the host planner"
    dev = plan_mesh_device(table, verts.shape[0], 64, z_extent, 1 << 8)
    assert dev == (None, None)


def test_device_plan_empty_mesh():
    verts = np.zeros((0, 3, 3), np.float32)
    uvs = np.zeros((0, 3, 2), np.float32)
    types = np.zeros(0, np.int32)
    rgb = np.zeros((0, 3), np.float32)
    tex = np.zeros(0, np.int32)
    padded = _pad_tris([verts, uvs, types, rgb, tex], 256)
    table = jnp.asarray(build_tri_table(*padded))
    dev = plan_mesh_device(table, 0, 16, 16, 1 << 12)
    assert dev == (None, [])


def test_gather_slack_tableT_matches_manual_gather():
    # gather_slack returns the plan-order channel-major table directly; its
    # live columns must equal gathering the plain order by hand
    verts, uvs, types, rgb, tex = _random_table(500, 64, seed=4)
    n_pad = _pow2_at_least(verts.shape[0])
    padded = _pad_tris([verts, uvs, types, rgb, tex], n_pad)
    table = jnp.asarray(build_tri_table(*padded))

    order, segs = plan_mesh_device(table, 500, 64, 64, 1 << 14)
    tableT, segs2 = plan_mesh_device(
        table, 500, 64, 64, 1 << 14, gather_slack=64
    )
    assert segs2 == segs
    m = segs[-1].r1
    want = np.asarray(table)[np.asarray(order)[:m]].T
    np.testing.assert_array_equal(np.asarray(tableT)[:, :m], want)
    assert tableT.shape[0] == 24 and tableT.shape[1] >= m + 64


@pytest.mark.parametrize("group", [2, 8])
def test_group_plan_covers_host_plan(group):
    """Group segments must cover every host-plan incidence with k_group >=
    k_member, r0/r1 on group boundaries, and the gathered table in group
    order (each group's triangle rows consecutive and untouched)."""
    verts, uvs, types, rgb, tex = _random_table(700, 128, seed=5)
    n_pad = _pow2_at_least(verts.shape[0])
    padded = _pad_tris([verts, uvs, types, rgb, tex], n_pad)
    table = jnp.asarray(build_tri_table(*padded))

    # budget 2^23 keeps this mesh inside the device planner's 32-slab
    # domain: the ~210 grid-scale triangles put ~3M slots on EVERY z row, so
    # the round-4 version's 2^16 budget forced 64 two-row slabs -> designed
    # host fallback -> (None, None); that version could never pass — it sat
    # beyond the point every round-3/4 full-suite run crashed at
    host_order, host_segs = plan_mesh(
        *_aabbs(verts, 128, 128), 128, 128, 1 << 23
    )
    order, segs1 = plan_mesh_device(table, 700, 128, 128, 1 << 23)
    tableT, gsegs = plan_mesh_device(
        table, 700, 128, 128, 1 << 23, gather_slack=32, group=group
    )
    tab = np.asarray(table)
    tT = np.asarray(tableT)

    # per-slab: group plan's member set ⊇ host plan's triangle set, with
    # group k >= each covered member's host k
    host_k = {}  # (z_lo, z_hi, tri) -> k
    for s in host_segs:
        for r in range(s.r0, s.r1):
            host_k[(s.z_lo, s.z_hi, int(host_order[r]))] = s.k

    seen = {}
    for s in gsegs:
        assert s.r0 % group == 0 and s.r1 % group == 0
        for gr in range(s.r0 // group, s.r1 // group):
            # the gathered columns must be the group's 8 consecutive rows
            cols = tT[:, gr * group : (gr + 1) * group]
            gid = None
            for cand in range(tab.shape[0] // group):
                if np.array_equal(
                    cols, tab[cand * group : (cand + 1) * group].T
                ):
                    gid = cand
                    break
            assert gid is not None, "gathered group not found in table"
            for j in range(group):
                tri = gid * group + j
                key = (s.z_lo, s.z_hi, tri)
                if key in host_k:
                    assert host_k[key] <= s.k
                    seen[key] = True
    assert set(seen) == set(host_k), "group plan missed host incidences"


def _aabbs(verts, res, z_extent):
    clamp_hi = np.array([res, res, z_extent], np.float32)
    vmin = np.clip(np.floor(verts.min(axis=1)), 0, clamp_hi).astype(np.int64)
    vmax = np.clip(np.floor(verts.max(axis=1)) + 1, 0, clamp_hi).astype(
        np.int64
    )
    return vmin, vmax


def test_group_engine_output_matches_ungrouped(monkeypatch):
    """End-to-end: O2V_GROUP=8 and =1 produce identical voxels."""
    import os

    from obj2voxel_tpu.engine import TriangleSoup, voxelize_soup

    rng = np.random.RandomState(0)
    n = 300
    soup = TriangleSoup(
        verts=rng.rand(n, 3, 3).astype(np.float32),
        uvs=np.zeros((n, 3, 2), np.float32),
        types=np.full(n, 1, np.int32),
        rgb=rng.rand(n, 3).astype(np.float32),
        tex=np.full(n, -1, np.int32),
    )

    def run(g):
        monkeypatch.setenv("O2V_GROUP", str(g))
        out = {}
        for xyz, argb in voxelize_soup(soup, resolution=64):
            for p, c in zip(np.asarray(xyz), np.asarray(argb)):
                out[tuple(p)] = int(c)
        return out

    a = run(8)
    b = run(1)
    assert a == b


def test_device_slab_scan_matches_host_greedy():
    """_device_slabs == expand_bucket.slabs_from_rows for random histograms
    (pair-granularity greedy == per-row greedy + align-down, see its
    docstring)."""
    import jax

    from obj2voxel_tpu.ops.expand_bucket import slabs_from_rows
    from obj2voxel_tpu.ops.plan_device import _SCAN_SLOTS, _device_slabs

    rng = np.random.RandomState(3)
    for trial in range(12):
        z_extent = int(rng.choice([4, 16, 63, 64, 128]))
        stride = int(rng.choice([16, 64, 1024, 4096]))
        budget = int(rng.choice([1 << 8, 1 << 12, 1 << 16]))
        per_row = (rng.rand(z_extent) * rng.choice([10, 1000, 100000])).astype(
            np.float32
        )
        if trial == 0:
            per_row[:] = 0.0  # empty mesh
        host = slabs_from_rows(per_row, stride, z_extent, budget, align=2)
        max_h = max(2, (2**31 - 2) // (stride * stride))
        bounds, n = jax.jit(
            _device_slabs, static_argnums=(1, 2, 3)
        )(jnp.asarray(per_row), z_extent, budget, 2 * (max_h // 2))
        n = int(n)
        if n > _SCAN_SLOTS:
            continue
        bounds = np.asarray(bounds)
        dev = [(int(bounds[i]), int(bounds[i + 1])) for i in range(n)]
        assert dev == host, (trial, z_extent, stride, budget, dev, host)


def test_fused_plan_matches_two_pull(monkeypatch):
    """The single-pull fused planner returns the same order + segments as
    the two-pull flow (any hint, including a too-small one that escalates)."""
    arrays = _random_table(300, 64, seed=5)
    n_pad = _pow2_at_least(300)
    table = jnp.asarray(build_tri_table(*_pad_tris(list(arrays), n_pad)))
    monkeypatch.setenv("O2V_PLAN_FUSED", "0")
    order0, segs0 = plan_mesh_device(table, 300, 64, 64, 1 << 12)
    monkeypatch.setenv("O2V_PLAN_FUSED", "1")
    for hint in (None, 1, 8):
        order1, segs1 = plan_mesh_device(
            table, 300, 64, 64, 1 << 12, slab_hint=hint
        )
        assert segs1 == segs0, hint
        m = segs0[-1].r1
        np.testing.assert_array_equal(
            np.asarray(order0)[:m], np.asarray(order1)[:m]
        )
