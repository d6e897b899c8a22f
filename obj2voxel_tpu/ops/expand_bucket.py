"""Bucketed (triangle, voxel) pair expansion.

Replaces the searchsorted-based `expand.expand_tile` on the hot path: a binary
search per pair costs ~18 dependent gathers (measured ~235 ms per 1M pairs on
TPU), while this scheme needs one small gather plus shifts/masks.

Idea: on the host, triangles overlapping a slab are grouped into buckets by
ceil-log2 of their slab-clamped AABB volume.  Within bucket k every triangle
owns exactly 2^k pair slots, so for a pair slot index `s` the triangle is
`idx[s >> k]` and the within-AABB rank is `s & (2^k - 1)` -- no search.  The
pow2 rounding wastes at most 2x pair slots, which the clip discards for free
(rank >= actual volume).  This is the role the reference's
SUBDIVISION_VOLUME_LIMIT plays as a work regularizer (voxelization.cpp:349-379)
re-expressed as static shape algebra.

Tiles are described by three per-tile scalars (shift k, triangle index base,
local pair-slot base) so one compiled kernel serves every bucket mix; tiles
never span buckets (the host pads each bucket's slot domain to whole tiles).
"""

from __future__ import annotations

import numpy as np


def plan_slab(vmin, vmax, z_lo, z_hi, tile):
    """Host planner for one z-slab.

    vmin/vmax: (N, 3) int64 voxel AABBs already clamped to the grid in x/y
               (vmax exclusive).
    Returns (idx, shifts, idx_base, local_base, n_tiles) numpy int32 arrays,
    or None if the slab is empty.  All per-tile pair-slot ranges fit int32
    because a slab's cell count is < 2^31 by construction.
    """
    z0 = np.maximum(vmin[:, 2], z_lo)
    z1 = np.minimum(vmax[:, 2], z_hi)
    sx = vmax[:, 0] - vmin[:, 0]
    sy = vmax[:, 1] - vmin[:, 1]
    sz = z1 - z0
    counts = np.where((sz > 0) & (sx > 0) & (sy > 0), sx * sy * sz, 0)
    live = np.nonzero(counts)[0]
    if live.size == 0:
        return None

    k = np.zeros(live.size, np.int32)
    c = counts[live]
    k = np.ceil(np.log2(np.maximum(c, 1))).astype(np.int32)
    # guard against float log edge cases
    too_small = (np.int64(1) << k.astype(np.int64)) < c
    k[too_small] += 1

    order = np.argsort(k, kind="stable")
    live = live[order]
    k = k[order]

    idx_parts = []
    shifts, idx_base, local_base = [], [], []
    offset = 0
    for kk in np.unique(k):
        sel = k == kk
        tris = live[sel].astype(np.int32)
        nk = tris.size
        dom = 1 << int(kk)
        if dom <= tile:
            per_tile = tile // dom
            ntk = -(-nk // per_tile)
            pad = ntk * per_tile - nk
            if pad:
                tris = np.concatenate([tris, np.full(pad, -1, np.int32)])
            idx_parts.append(tris)
            shifts.append(np.full(ntk, kk, np.int32))
            idx_base.append(offset + np.arange(ntk, dtype=np.int32) * per_tile)
            local_base.append(np.zeros(ntk, np.int32))
            offset += tris.size
        else:
            tiles_per_tri = dom // tile
            idx_parts.append(tris)
            shifts.append(np.full(nk * tiles_per_tri, kk, np.int32))
            idx_base.append(
                offset + np.repeat(np.arange(nk, dtype=np.int32), tiles_per_tri)
            )
            local_base.append(
                np.tile(
                    np.arange(tiles_per_tri, dtype=np.int64) * tile, nk
                ).astype(np.int32)
            )
            offset += nk

    idx = np.concatenate(idx_parts)
    shifts = np.concatenate(shifts)
    idx_base = np.concatenate(idx_base)
    local_base = np.concatenate(local_base)
    return idx, shifts, idx_base, local_base, shifts.size


def plan_adaptive_slabs(vmin, vmax, stride, z_extent, slot_budget, align=2):
    """Choose z-slab boundaries so each slab's estimated pair-slot count fits
    `slot_budget` (single device pass per slab) while keys stay below int31.

    Estimates per-z-row slot counts with a difference-array histogram of
    sx*sy contributions (pow2 bucket rounding adds up to 2x, so callers
    should pass a budget with margin).  Boundaries are aligned to `align`
    (2 keeps supersampled downscale slab-local).
    """
    sx = np.maximum(vmax[:, 0] - vmin[:, 0], 0)
    sy = np.maximum(vmax[:, 1] - vmin[:, 1], 0)
    area = (sx * sy).astype(np.int64)
    z0 = np.clip(vmin[:, 2], 0, z_extent)
    z1 = np.clip(vmax[:, 2], 0, z_extent)
    diff = np.zeros(z_extent + 1, np.int64)
    np.add.at(diff, z0, area)
    np.add.at(diff, z1, -area)
    per_row = np.cumsum(diff[:-1])
    return slabs_from_rows(per_row, stride, z_extent, slot_budget, align)


def slabs_from_rows(per_row, stride, z_extent, slot_budget, align=2):
    """Slab boundaries from a per-z-row slot-count histogram (int or float;
    the device planner supplies f32 counts, exact enough for budgeting)."""
    max_h_keys = max(align, (2**31 - 2) // (stride * stride))

    slabs = []
    z = 0
    while z < z_extent:
        acc = 0
        zh = z
        while zh < z_extent and zh - z < max_h_keys:
            nxt = acc + int(per_row[zh])
            if zh > z and nxt > slot_budget:
                break
            acc = nxt
            zh += 1
        # align the boundary (never below z + align unless at the end)
        if zh < z_extent:
            zh = max(z + align, zh - (zh - z) % align)
        slabs.append((z, min(zh, z_extent)))
        z = slabs[-1][1]
    return slabs
