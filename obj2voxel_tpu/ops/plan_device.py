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


#: device slab-scan boundary-slot cap (> MAX_DEVICE_SLABS so overflow is
#: detectable: the count keeps incrementing while writes clamp)
_SCAN_SLOTS = MAX_DEVICE_SLABS + 2


def _device_slabs(per_row, z_extent, slot_budget, max_h_even):
    """slabs_from_rows (align=2) as a device scan over z-row PAIRS.

    Pair granularity is equivalent to the host's per-row greedy + align-down:
    per-row prefix sums are nondecreasing, so the largest feasible even
    boundary equals the largest feasible boundary rounded down to even, and
    both sides force a minimum height of 2 (expand_bucket.slabs_from_rows;
    parity asserted by tests/test_plan_device.py).

    Returns (bounds (_SCAN_SLOTS+1,) int32, n_slabs int32): slab i spans
    [bounds[i], bounds[i+1]) for i < min(n_slabs, _SCAN_SLOTS).  n_slabs >
    MAX_DEVICE_SLABS signals the host-planner fallback."""
    rows = per_row.shape[0]
    fv = jnp.floor(per_row)  # host loop truncates each f32 row count
    if rows % 2:
        fv = jnp.concatenate([fv, jnp.zeros((1,), fv.dtype)])
    pv = fv.reshape(-1, 2).sum(axis=1)
    budget = jnp.float32(slot_budget)

    def step(carry, tv):
        start, acc, nsl, bounds = carry
        t, v = tv
        z = 2 * t
        h = z - start
        take = (h == 0) | ((acc + v <= budget) & (h < max_h_even))
        close = ~take
        nsl2 = nsl + close.astype(jnp.int32)
        idx = jnp.minimum(nsl2, _SCAN_SLOTS)
        bounds = bounds.at[idx].set(jnp.where(close, z, bounds[idx]))
        return (
            jnp.where(take, start, z),
            jnp.where(take, acc + v, v),
            nsl2,
            bounds,
        ), None

    t_ids = jnp.arange(pv.shape[0], dtype=jnp.int32)
    init = (
        jnp.int32(0),
        jnp.float32(0),
        jnp.int32(0),
        jnp.zeros(_SCAN_SLOTS + 1, jnp.int32),
    )
    (_, _, nsl, bounds), _ = jax.lax.scan(
        step, init, (t_ids, pv), unroll=8
    )
    n_slabs = nsl + 1
    bounds = bounds.at[jnp.minimum(n_slabs, _SCAN_SLOTS)].set(z_extent)
    return bounds, n_slabs


@functools.partial(
    jax.jit, static_argnames=("stride", "z_extent", "slot_budget", "s_pad",
                              "group")
)
def _stage12(table, n_sub, *, stride, z_extent, slot_budget, s_pad, group):
    """Fused single-pull planner: stage 1 + device slab scan + stage 2.

    Round-5 replacement for the two-blocking-pull flow (each pull costs
    ~33 ms through the relay regardless of size): the host slab loop runs ON
    DEVICE (`_device_slabs`) so slab boundaries feed stage 2 without a
    round-trip, and ONE pull returns [n_slabs, slab bounds, segment bounds].
    s_pad is SPECULATIVE (n_slabs is unknown at dispatch): the caller
    escalates to a bigger `_stage2` (second pull, rare) when
    n_slabs > s_pad, or to the host planner when n_slabs >
    MAX_DEVICE_SLABS."""
    per_row, vmin, vmax = _stage1(
        table, n_sub, stride=stride, z_extent=z_extent
    )
    max_h_keys = max(2, (2**31 - 2) // (stride * stride))
    sbounds, n_slabs = _device_slabs(
        per_row, z_extent, slot_budget, 2 * (max_h_keys // 2)
    )
    sid = jnp.arange(s_pad, dtype=jnp.int32)
    ok = sid < jnp.minimum(n_slabs, s_pad)
    starts = jnp.where(ok, sbounds[jnp.minimum(sid, _SCAN_SLOTS)], z_extent)
    stops = jnp.where(
        ok, sbounds[jnp.minimum(sid + 1, _SCAN_SLOTS)], z_extent
    )
    stri, bounds = _stage2(
        vmin, vmax, n_sub, starts, stops, jnp.minimum(n_slabs, s_pad),
        s_pad=s_pad, group=group,
    )
    info = jnp.concatenate([n_slabs[None], sbounds, bounds.astype(jnp.int32)])
    return stri, info, vmin, vmax


@functools.partial(jax.jit, static_argnames=("s_pad", "group"))
def _stage2(vmin, vmax, n_sub, starts, stops, n_slabs, *, s_pad, group=1):
    """Stable-sort (slab*64 + k) keys over all (group, slab) incidences.

    group: triangles per planning unit.  G=1 is the per-triangle plan (bit-
    identical to the host planner).  G>1 plans CONSECUTIVE table rows as one
    unit: the unit's bucket is the max member k and it is incident to a slab
    iff any member is -- members outside the slab (or dead) clip to vol=0 in
    the pass kernel, costing slots but no correctness.  The point is the
    pass GATHER: (G*24)-wide rows move at ~13 GB/s where 24-wide rows are
    row-latency-bound at ~1.3 GB/s (probes/probe_gather_width.py) -- at 2M
    tris the gather drops ~200 ms -> ~20 ms; the (N/G x s_pad) sort also
    shrinks G-fold.  The tradeoff is slot waste when neighbors differ in
    size (mesh-local triangles rarely do) and G-fold giant-bucket walks.

    Returns (sorted group ids (N/group*s_pad,) -- stays on device -- and the
    (s_pad*64 + 1,) segment boundary offsets, in GROUP units).  Dead
    incidences key to s_pad*64 and sort to the tail, so live rows form a
    prefix.
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
    if group > 1:
        n_g = vmin.shape[0] // group
        k = jnp.max(
            jnp.where(live, k, -1).reshape(n_g, group, s_pad), axis=1
        )
        live = jnp.any(live.reshape(n_g, group, s_pad), axis=1)
        row = jnp.arange(n_g, dtype=jnp.int32)
    key = jnp.where(live, s_id[None, :] * 64 + k, s_pad * 64).astype(jnp.int32)

    tri = jnp.broadcast_to(row[:, None], key.shape)
    skey, stri = jax.lax.sort(
        (key.reshape(-1), tri.reshape(-1)), num_keys=1, is_stable=True
    )
    bounds = jnp.searchsorted(skey, jnp.arange(s_pad * 64 + 1, dtype=jnp.int32))
    return stri, bounds


#: early-gather cap: `gather_slack` gathers at stri's FULL static size
#: (N_pad * s_pad + slack) before `m` is known; past this many rows the
#: dead-tail waste (and the (24, M) device buffer, ~96 B/row) outgrows the
#: overlap win, so the caller falls back to the post-pull m_pad-sized gather
MAX_EARLY_GATHER_ROWS = 1 << 25


def plan_mesh_device(table, n_sub, stride, z_extent, slot_budget, align=2,
                     timing=False, gather_slack=None, group=1,
                     slab_hint=None):
    """Plan the full pass schedule with the sort on device.

    Default flow (round 5) is the SINGLE-PULL fused planner `_stage12`: the
    slab-boundary greedy loop runs on device between stages 1 and 2, so the
    ~33 ms relay pull that used to feed the host slab loop disappears.  The
    stage-2 key width s_pad must be chosen BEFORE n_slabs is known; it is
    speculated from `slab_hint` (the caller's host-side slot-count estimate,
    in slabs) and escalated with a second `_stage2` dispatch + pull when the
    speculation was too narrow (rare).  O2V_PLAN_FUSED=0 restores the
    two-pull flow.

    table:  (N_pad, 24) device-resident triangle row table (build_tri_table).
    n_sub:  number of real (unpadded) rows.

    Always returns a (order_device, segments) tuple mirroring plan.plan_mesh:
      * (order, segments) -- order is a device int32 array whose live prefix
        is the gather order;
      * (None, [])        -- empty mesh, nothing to voxelize;
      * (None, None)      -- the mesh needs the HOST planner (too many slabs).

    gather_slack (rows): when set, the (order, segments) success case returns
    (tableT, segments) instead, with tableT = the (24, M) channel-major
    gather of `table` into plan order, zero-index padded by at least `slack`
    rows so no pass's dynamic_slice can clamp (the caller's max pass
    budget).  The gather is dispatched BEFORE the blocking segment-bounds
    pull: its device time (~200 ms at 2M tris per-triangle -- row-latency
    bound, probes/probe_gather_sorted.py) overlaps the pull + host segment
    loop instead of landing in the first wave's drain.  Falls back to the
    tighter post-pull m_pad-sized gather when the early size would exceed
    MAX_EARLY_GATHER_ROWS.

    group: triangles per planning unit (power of 2 dividing N_pad; see
    _stage2).  Segments and the gathered tableT are ALWAYS in triangle-row
    units -- a group-planned segment's r0/r1 are multiples of `group` and
    its bucket k is the group-max -- so the engine's pass chunking and the
    pass kernels are agnostic to it.  Requires gather_slack (the plain-order
    return would be in group units); G>1 plans are NOT bit-comparable to the
    host planner.
    """
    import os as _os
    import time as _time

    if group > 1 and gather_slack is None:
        raise ValueError("group > 1 requires gather_slack (see docstring)")
    slack_g = None
    if gather_slack is not None:
        slack_g = -(-int(gather_slack) // group)

    def early_gather(stri):
        if gather_slack is None:
            return None
        if (stri.shape[0] + slack_g) * group <= MAX_EARLY_GATHER_ROWS:
            return _gather_ordered(table, stri, slack=slack_g, group=group)
        return None

    def finish(stri, tableT, bounds_h, starts, stops, s_pad):
        _tf = _time.perf_counter() if timing else 0.0
        segments = []
        for i in range(s_pad * 64):
            r0, r1 = int(bounds_h[i]), int(bounds_h[i + 1])
            if r1 == r0:
                continue
            s = i // 64
            # segments are ALWAYS in triangle-row units (bounds: group units)
            segments.append(
                Segment(int(starts[s]), int(stops[s]), i % 64,
                        r0 * group, r1 * group)
            )
        _tseg = _time.perf_counter() if timing else 0.0
        if not segments:
            return None, []
        if gather_slack is None:
            return stri, segments
        if tableT is None:
            # capped: gather after the pull at the tight m_pad size (the
            # early gather's dead-tail waste would outweigh the overlap win)
            m_g = segments[-1].r1 // group
            m_pad_g = 1 << max(int(m_g + slack_g - 1).bit_length(), 10)
            tableT = _gather_ordered(
                table, stri, slack=0, group=group, pad_to=m_pad_g
            )
        if timing:
            print(
                f"[o2v-timing]   plan-finish: segments "
                f"{(_tseg - _tf) * 1000:.0f}ms gather-dispatch "
                f"{(_time.perf_counter() - _tseg) * 1000:.0f}ms",
                flush=True,
            )
        return tableT, segments

    def pad_slabs(slabs, s_pad):
        starts = np.full(s_pad, z_extent, np.int32)
        stops = np.full(s_pad, z_extent, np.int32)
        starts[: len(slabs)] = [s[0] for s in slabs]
        stops[: len(slabs)] = [s[1] for s in slabs]
        return starts, stops

    # The fused single-pull flow exists to remove a ~33 ms RELAY pull; on
    # the CPU backend there is no relay, and _stage12's fused program (whose
    # static-arg space is the product of stride/z_extent/budget/s_pad/group)
    # measured MINUTES of XLA CPU compile per variant -- it single-handedly
    # stalled the round-5 test suite.  Default it on for devices only;
    # O2V_PLAN_FUSED=1/0 still forces either flow anywhere.
    fused_default = "0" if jax.default_backend() == "cpu" else "1"
    if _os.environ.get("O2V_PLAN_FUSED", fused_default) != "0":
        # single-pull fused flow; s_pad speculated from the caller's hint
        hint = max(1, int(slab_hint) if slab_hint else 8)
        s_pad = next(
            (s for s in _S_LADDER if s >= hint), _S_LADDER[-1]
        )
        _t0 = _time.perf_counter() if timing else 0.0
        stri, info, vmin, vmax = _stage12(
            table, jnp.int32(n_sub), stride=stride, z_extent=z_extent,
            slot_budget=slot_budget, s_pad=s_pad, group=group,
        )
        tableT = early_gather(stri)
        info_h = np.asarray(info)  # THE one blocking pull
        n_slabs = int(info_h[0])
        sbounds = info_h[1 : _SCAN_SLOTS + 2]
        bounds_h = info_h[_SCAN_SLOTS + 2 :]
        if timing:
            print(
                f"[o2v-timing]   plan: fused stage12+pull "
                f"{(_time.perf_counter() - _t0) * 1000:.0f}ms "
                f"(s_pad={s_pad}, n_slabs={n_slabs})",
                flush=True,
            )
        if n_slabs > MAX_DEVICE_SLABS:
            return None, None  # host fallback (e.g. batch mode)
        slabs = [(int(sbounds[i]), int(sbounds[i + 1]))
                 for i in range(n_slabs)]
        if n_slabs > s_pad:
            # speculation too narrow: redo stage 2 at the real width
            # (second pull; rare -- the hint covers the common cases)
            s_pad = next(s for s in _S_LADDER if s >= n_slabs)
            starts, stops = pad_slabs(slabs, s_pad)
            stri, bounds = _stage2(
                vmin, vmax, jnp.int32(n_sub),
                jnp.asarray(starts), jnp.asarray(stops),
                jnp.int32(n_slabs), s_pad=s_pad, group=group,
            )
            tableT = early_gather(stri)
            bounds_h = np.asarray(bounds)
            if timing:
                print(
                    f"[o2v-timing]   plan: s_pad escalation -> {s_pad}",
                    flush=True,
                )
        else:
            starts, stops = pad_slabs(slabs, s_pad)
        return finish(stri, tableT, bounds_h, starts, stops, s_pad)

    _t0 = _time.perf_counter() if timing else 0.0
    per_row, vmin, vmax = _stage1(
        table, jnp.int32(n_sub), stride=stride, z_extent=z_extent
    )
    per_row_h = np.asarray(per_row)
    _t1 = _time.perf_counter() if timing else 0.0
    slabs = slabs_from_rows(per_row_h, stride, z_extent, slot_budget, align)
    if not slabs:
        return None, []
    if len(slabs) > MAX_DEVICE_SLABS:
        return None, None  # host fallback

    s_pad = next(s for s in _S_LADDER if s >= len(slabs))
    starts, stops = pad_slabs(slabs, s_pad)

    _t2 = _time.perf_counter() if timing else 0.0
    stri, bounds = _stage2(
        vmin,
        vmax,
        jnp.int32(n_sub),
        jnp.asarray(starts),
        jnp.asarray(stops),
        jnp.int32(len(slabs)),
        s_pad=s_pad,
        group=group,
    )
    tableT = early_gather(stri)
    bounds_h = np.asarray(bounds)
    if timing:
        _t3 = _time.perf_counter()
        print(
            f"[o2v-timing]   plan: stage1+pull {(_t1 - _t0) * 1000:.0f}ms "
            f"slab-loop {(_t2 - _t1) * 1000:.0f}ms "
            f"stage2+pull {(_t3 - _t2) * 1000:.0f}ms (s_pad={s_pad})",
            flush=True,
        )
    return finish(stri, tableT, bounds_h, starts, stops, s_pad)


@functools.partial(jax.jit, static_argnames=("slack", "group", "pad_to"))
def _gather_ordered(table, order, *, slack, group=1, pad_to=None):
    """Channel-major (24, M) gather of `table` into plan order.

    order:  group ids (triangle ids when group=1).
    slack:  zero-index GROUP rows appended (row 0 repeats -- cache-resident,
            so the tail is cheap); used by the early (pre-pull) gather.
    group:  triangles per order entry; the gather moves (group*24)-wide rows
            (~13 GB/s at 192 wide vs ~1.3 GB/s at 24 -- the whole point,
            probes/probe_gather_width.py).
    pad_to: slice/pad the order to exactly this many GROUP rows first; used
            by the capped post-pull gather."""
    if pad_to is not None and pad_to > order.shape[0]:
        order = jnp.concatenate(
            [order, jnp.zeros(pad_to - order.shape[0], jnp.int32)]
        )
    elif pad_to is not None and pad_to < order.shape[0]:
        order = jax.lax.slice(order, (0,), (pad_to,))
    if slack:
        order = jnp.concatenate([order, jnp.zeros(slack, jnp.int32)])
    n_g = table.shape[0] // group
    rows = table.reshape(n_g, group * 24)[order]
    # keep the gather and the (M, 24) -> (24, M) transpose in separate XLA
    # fusions: fused gather-into-transposed-layout degrades to per-element
    # random access (70.8 s vs 0.2 s at 2^22 random rows, profile_gather.py)
    (rows,) = jax.lax.optimization_barrier((rows,))
    return rows.reshape(order.shape[0] * group, 24).T
