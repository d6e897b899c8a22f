"""Device-side global (slab x volume-bucket) pass planning.

Round-2 follow-up to ops/plan.py: the host planner costs ~0.5 s of numpy at
2M triangles and -- worse in this environment -- must upload the 8-17 MB
gather-order array through the ~15 MB/s relay link (~1-2 s, measured as the
dominant warm-path cost after the bucketed passes landed).  On a real TPU
host the upload is cheap, but the host sort still serializes with the device.

This planner runs the same plan ON the TPU and keeps the order there:

  stage 1: per-triangle voxel AABBs + a per-z-row slot histogram (one
           jnp scatter-add + cumsum); ONE ~z_extent*4-byte pull feeds the
           host slab-boundary loop (shared with the host planner,
           expand_bucket.slabs_from_rows).
  stage 2: a (triangle x slab) key matrix -- key = slab*64 + ceil_log2(
           slab-clamped AABB volume) -- flattened and stable-sorted on
           device with the triangle id as payload; segment boundaries come
           from ONE searchsorted pull (~(32*64+1)*4 bytes).  The sorted
           triangle order NEVER leaves the device: the pass gather indexes
           it directly.

Ordering parity: flattening (triangle, slab) row-major enumerates incidences
exactly like the host planner's repeat loop, and the sort is stable, so the
resulting order and segments are bit-identical to ops/plan.plan_mesh --
tests/test_plan_device.py asserts this.  (The reference has no analog of
this stage; its workers re-scan all triangles per chunk,
src/voxelization.cpp:440-444.)

Meshes needing more than MAX_DEVICE_SLABS slabs (batch mode stacks thousands
of tiny grids in z) fall back to the host planner: the key matrix is
N x n_slabs, and past ~32 slabs the broadcast outweighs the upload savings.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .expand_bucket import slabs_from_rows
from .plan import Segment

__all__ = ["plan_mesh_device", "MAX_DEVICE_SLABS"]

MAX_DEVICE_SLABS = 32
_S_LADDER = (1, 2, 4, 8, 16, 32)


@functools.partial(jax.jit, static_argnames=("stride", "z_extent"))
def _stage1(table, n_sub, *, stride, z_extent):
    """AABBs (device-resident, int32) + f32 per-z-row slot histogram."""
    v = table[:, 0:9].reshape(-1, 3, 3)
    hi = jnp.array([stride, stride, z_extent], jnp.float32)
    vmin = jnp.clip(jnp.floor(jnp.min(v, axis=1)), 0.0, hi).astype(jnp.int32)
    vmax = jnp.clip(jnp.floor(jnp.max(v, axis=1)) + 1.0, 0.0, hi).astype(jnp.int32)

    row = jnp.arange(table.shape[0], dtype=jnp.int32)
    sx = vmax[:, 0] - vmin[:, 0]
    sy = vmax[:, 1] - vmin[:, 1]
    area = jnp.where(row < n_sub, (sx * sy).astype(jnp.float32), 0.0)
    diff = jnp.zeros(z_extent + 1, jnp.float32)
    diff = diff.at[vmin[:, 2]].add(area).at[vmax[:, 2]].add(-area)
    per_row = jnp.cumsum(diff[:-1])
    return per_row, vmin, vmax


@functools.partial(jax.jit, static_argnames=("s_pad",))
def _stage2(vmin, vmax, n_sub, starts, stops, n_slabs, *, s_pad):
    """Stable-sort (slab*64 + k) keys over all (triangle, slab) incidences.

    Returns (sorted triangle ids (N*s_pad,) -- stays on device -- and the
    (s_pad*64 + 1,) segment boundary offsets).  Dead incidences key to
    s_pad*64 and sort to the tail, so live rows form a prefix.
    """
    row = jnp.arange(vmin.shape[0], dtype=jnp.int32)
    sx = vmax[:, 0] - vmin[:, 0]
    sy = vmax[:, 1] - vmin[:, 1]
    alive = (row < n_sub) & (sx > 0) & (sy > 0)

    s_id = jnp.arange(s_pad, dtype=jnp.int32)
    z0 = jnp.maximum(vmin[:, 2][:, None], starts[None, :])
    z1 = jnp.minimum(vmax[:, 2][:, None], stops[None, :])
    dz = z1 - z0
    # per-slab AABB volume < 2^31 by slab construction (max_h_keys)
    c = sx[:, None] * sy[:, None] * dz
    # exact ceil_log2 via count-leading-zeros (no float-log edge cases)
    k = jnp.where(c <= 1, 0, 32 - jax.lax.clz(jnp.maximum(c - 1, 1)))
    live = alive[:, None] & (dz > 0) & (s_id[None, :] < n_slabs)
    key = jnp.where(live, s_id[None, :] * 64 + k, s_pad * 64).astype(jnp.int32)

    tri = jnp.broadcast_to(row[:, None], key.shape)
    skey, stri = jax.lax.sort(
        (key.reshape(-1), tri.reshape(-1)), num_keys=1, is_stable=True
    )
    bounds = jnp.searchsorted(skey, jnp.arange(s_pad * 64 + 1, dtype=jnp.int32))
    return stri, bounds


def plan_mesh_device(table, n_sub, stride, z_extent, slot_budget, align=2):
    """Plan the full pass schedule with the sort on device.

    table:  (N_pad, 24) device-resident triangle row table (build_tri_table).
    n_sub:  number of real (unpadded) rows.

    Always returns a (order_device, segments) tuple mirroring plan.plan_mesh:
      * (order, segments) -- order is a device int32 array whose live prefix
        is the gather order;
      * (None, [])        -- empty mesh, nothing to voxelize;
      * (None, None)      -- the mesh needs the HOST planner (too many slabs).
    """
    per_row, vmin, vmax = _stage1(
        table, jnp.int32(n_sub), stride=stride, z_extent=z_extent
    )
    slabs = slabs_from_rows(
        np.asarray(per_row), stride, z_extent, slot_budget, align
    )
    if not slabs:
        return None, []
    if len(slabs) > MAX_DEVICE_SLABS:
        return None, None  # host fallback

    s_pad = next(s for s in _S_LADDER if s >= len(slabs))
    starts = np.full(s_pad, z_extent, np.int32)
    stops = np.full(s_pad, z_extent, np.int32)
    starts[: len(slabs)] = [s[0] for s in slabs]
    stops[: len(slabs)] = [s[1] for s in slabs]

    stri, bounds = _stage2(
        vmin,
        vmax,
        jnp.int32(n_sub),
        jnp.asarray(starts),
        jnp.asarray(stops),
        jnp.int32(len(slabs)),
        s_pad=s_pad,
    )
    bounds_h = np.asarray(bounds)

    segments = []
    for i in range(s_pad * 64):
        r0, r1 = int(bounds_h[i]), int(bounds_h[i + 1])
        if r1 == r0:
            continue
        s = i // 64
        segments.append(Segment(int(starts[s]), int(stops[s]), i % 64, r0, r1))
    if not segments:
        return None, []
    return stri, segments
