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
