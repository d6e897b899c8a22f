"""Global (slab x volume-bucket) pass planning for the streaming engine.

Round-2 redesign of the hot-path work schedule.  The round-1 engine gathered
one packed triangle row PER (triangle, voxel) PAIR inside the device tile loop;
measured on the TPU, that XLA gather runs at ~2 GB/s and was ~half of every
pass (probes/probe_r2.out: 133 ms per 2^21 rows, vs 2.3 ms for the clip math).

The fix is structural: gather per TRIANGLE, not per pair.  On the host we
compute, for every z-slab, the set of triangles overlapping it and each
triangle's slab-clamped AABB volume, bucket them by ceil-log2(volume), and
emit ONE global row order: all rows of (slab 0, k=0), then (slab 0, k=1), ...
then slab 1, and so on.  The device gathers the triangle table into that order
ONCE per mesh.  A pass over bucket k then reads a *contiguous* row range and
expands each row into exactly 2^k pair slots -- with k static per pass, the
expansion is a plain XLA broadcast+reshape (pure data movement), and the
within-AABB rank is `iota & (2^k - 1)`.  No gather, no searchsorted, nothing
data-dependent on the pair axis.

This plays the same work-regularizer role as the reference's subdivision limit
(reference src/voxelization.cpp:349-379 bounds per-triangle AABB volume to
SUBDIVISION_VOLUME_LIMIT=512): bounded, shape-static per-triangle work.  The
pow2 rounding wastes at most 2x pair slots; dead slots clip to zero weight and
vanish in the combine.

Triangles spanning multiple slabs appear once per slab they touch (the
reference re-voxelizes such triangles per chunk, clipped to chunk bounds --
src/voxelization.cpp:440-444 -- with the same duplication property).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .expand_bucket import plan_adaptive_slabs

__all__ = ["Segment", "plan_mesh", "plan_adaptive_slabs"]


@dataclasses.dataclass(frozen=True)
class Segment:
    """One (slab, bucket) run of rows in the globally sorted triangle order.

    Rows [r0, r1) all belong to z-slab [z_lo, z_hi) and own 2^k pair slots
    each; total slot count is (r1 - r0) << k.
    """

    z_lo: int
    z_hi: int
    k: int
    r0: int
    r1: int

    @property
    def rows(self) -> int:
        return self.r1 - self.r0

    @property
    def slots(self) -> int:
        return self.rows << self.k


def _ceil_log2(counts: np.ndarray) -> np.ndarray:
    """Exact ceil(log2(c)) for int64 c >= 1 (float-log edge cases corrected)."""
    k = np.ceil(np.log2(np.maximum(counts, 1))).astype(np.int32)
    too_small = (np.int64(1) << k.astype(np.int64)) < counts
    k[too_small] += 1
    too_big = (k > 0) & ((np.int64(1) << np.maximum(k - 1, 0).astype(np.int64)) >= counts)
    k[too_big] -= 1
    return k


def plan_mesh(vmin, vmax, stride, z_extent, slot_budget, align=2, z_window=None):
    """Plan the full pass schedule for one mesh.

    vmin/vmax: (N, 3) int64 per-triangle voxel AABBs, x/y clamped to the grid,
               z clamped to [0, z_extent] (vmax exclusive).
    stride:    grid resolution in x/y (sample resolution).
    z_extent:  grid extent in z (== stride except in batch mode).
    slot_budget: target pair-slot count per slab (adaptive slab heights).
    z_window:  optional (z0, z1) restricting planning to a sub-range -- used
               by the multi-chip path, where each device owns a z range.

    Returns (order, segments):
      order:    (M,) int32 triangle indices, the global gather order
                (duplicates for slab-spanning triangles), or None if empty.
      segments: list[Segment] in order-of-rows (grouped by slab, ascending k).
    """
    if z_window is not None:
        w0, w1 = z_window
        slabs = [
            (max(z0, w0), min(z1, w1))
            for z0, z1 in plan_adaptive_slabs(
                vmin, vmax, stride, z_extent, slot_budget, align
            )
            if z1 > w0 and z0 < w1
        ]
    else:
        slabs = plan_adaptive_slabs(vmin, vmax, stride, z_extent, slot_budget, align)

    order_parts = []
    segments = []
    r = 0
    for z_lo, z_hi in slabs:
        z0 = np.maximum(vmin[:, 2], z_lo)
        z1 = np.minimum(vmax[:, 2], z_hi)
        sx = vmax[:, 0] - vmin[:, 0]
        sy = vmax[:, 1] - vmin[:, 1]
        sz = z1 - z0
        counts = np.where((sx > 0) & (sy > 0) & (sz > 0), sx * sy * sz, 0)
        live = np.nonzero(counts)[0]
        if live.size == 0:
            continue

        k = _ceil_log2(counts[live])
        sort = np.argsort(k, kind="stable")
        live = live[sort]
        k = k[sort]

        ks, starts = np.unique(k, return_index=True)
        bounds = np.append(starts, k.size)
        for i, kk in enumerate(ks):
            segments.append(
                Segment(int(z_lo), int(z_hi), int(kk), r + int(bounds[i]), r + int(bounds[i + 1]))
            )
        order_parts.append(live.astype(np.int32))
        r += live.size

    if not order_parts:
        return None, []
    return np.concatenate(order_parts), segments
