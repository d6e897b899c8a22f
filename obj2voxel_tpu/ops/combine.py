"""Per-voxel combine: sort by voxel key + segmented scan.

This replaces the reference's per-worker `VoxelMap` hash scatter and
`insertWeighted` combine (reference: src/util.hpp:179-208,
src/voxelization.cpp:56-69, 513-536) with the TPU-idiomatic equivalent: a
stable sort of the (voxel_key, weight, color) pair stream followed by a
segmented associative scan and a compaction of segment tails.

Both color strategies are associative:
  * MAX   -- keep the entry with the strictly greater weight; ties keep the
             earlier entry (reference util.hpp:167-172 `lhs.weight > rhs.weight`
             with lhs = new, rhs = existing).  Stable sort preserves stream
             order, and the scan keeps the leftmost maximum, matching that.
  * BLEND -- weighted running mean (util.hpp:159-165); represented here as
             (sum w, sum w*c) and divided once at the end, which is the same
             mean without intermediate rounding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import MAX_STRATEGY, BLEND_STRATEGY

#: Sentinel key for invalid / zero-weight pairs; sorts to the end.
INVALID_KEY = jnp.int32(2**31 - 1)


def sort_pairs(keys, values):
    """Stable sort `values` (tuple of (P,) or (P,C) arrays) by int32 `keys`."""
    P = keys.shape[0]
    iota = jnp.arange(P, dtype=jnp.int32)
    sorted_keys, perm = jax.lax.sort((keys, iota), num_keys=1, is_stable=True)
    return sorted_keys, tuple(v[perm] for v in values)


def _segment_combine(head, vals, strategy):
    """Segmented left-to-right scan over sorted runs.

    head: (P,) bool -- True at the first element of each key run.
    vals: (P, 4) float32 -- MAX: (w, r, g, b); BLEND: (w, w*r, w*g, w*b).
    Returns (P, 4) where the *last* element of each run holds the combined value.
    """
    if strategy == BLEND_STRATEGY:
        def inner(a, b):
            return a + b
    else:
        def inner(a, b):
            return jnp.where((b[:, :1] > a[:, :1]), b, a)

    def op(ca, cb):
        fa, va = ca
        fb, vb = cb
        return fa | fb, jnp.where(fb[:, None], vb, inner(va, vb))

    flags, out = jax.lax.associative_scan(op, (head, vals))
    del flags
    return out


def combine_sorted(sorted_keys, vals, strategy):
    """Combine a key-sorted pair stream into unique (key, value) rows.

    Returns (keys (P,), vals (P,4), count) where the first `count` rows are the
    unique combined voxels (still key-sorted) and the rest is padding with
    INVALID_KEY.
    """
    P = sorted_keys.shape[0]
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sorted_keys[:-1]])
    head = sorted_keys != prev
    combined = _segment_combine(head, vals, strategy)

    nxt = jnp.concatenate([sorted_keys[1:], jnp.full((1,), INVALID_KEY, jnp.int32)])
    tail = (sorted_keys != nxt) & (sorted_keys != INVALID_KEY)

    count = jnp.sum(tail.astype(jnp.int32))
    # Compact segment tails to the front (order-preserving).
    idx = jnp.nonzero(tail, size=P, fill_value=P - 1)[0]
    out_keys = jnp.where(jnp.arange(P) < count, sorted_keys[idx], INVALID_KEY)
    out_vals = jnp.where((jnp.arange(P) < count)[:, None], combined[idx], 0.0)
    return out_keys, out_vals, count


def combine_pairs(keys, weight, rgb, strategy):
    """Full combine of one tile: mask, sort, reduce, compact.

    keys:   (P,) int32 linear voxel keys (INVALID_KEY allowed)
    weight: (P,) float32 clip weights; w <= 0 entries are dropped
            (reference voxelization.cpp:466 drops zero-weight UVs)
    rgb:    (P, 3) float32 colors
    Returns (keys, vals, count); vals layout depends on strategy (see above).
    """
    live = weight > 0.0
    keys = jnp.where(live, keys, INVALID_KEY)
    if strategy == BLEND_STRATEGY:
        vals = jnp.concatenate([weight[:, None], weight[:, None] * rgb], axis=-1)
    else:
        vals = jnp.concatenate([weight[:, None], rgb], axis=-1)
    sorted_keys, (svals,) = sort_pairs(keys, (vals,))
    return combine_sorted(sorted_keys, svals, strategy)


def merge_combined(keys_list, vals_list, strategy, pad_to=None):
    """Merge several compacted (keys, vals) lists with another sort+combine."""
    keys = jnp.concatenate(keys_list)
    vals = jnp.concatenate(vals_list)
    if pad_to is not None and keys.shape[0] < pad_to:
        extra = pad_to - keys.shape[0]
        keys = jnp.concatenate([keys, jnp.full((extra,), INVALID_KEY, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((extra, vals.shape[1]), vals.dtype)])
    sorted_keys, (svals,) = sort_pairs(keys, (vals,))
    return combine_sorted(sorted_keys, svals, strategy)


def downscale_keys(keys, resolution):
    """2x2x2 downscale of linear voxel keys (fixes the reference's broken
    Voxelizer::downscale, reference voxelization.cpp:538-554: we halve each
    axis coordinate, not the linear index).

    keys are x + r*y + r^2*z at sample resolution `resolution`; the result is
    re-packed at resolution `resolution // 2`.
    """
    r = resolution
    r2 = r // 2
    x = keys % r
    y = (keys // r) % r
    z = keys // (r * r)
    return (x // 2) + r2 * (y // 2) + r2 * r2 * (z // 2)


def finalize_colors(vals, strategy):
    """Turn combined values into float rgb in [0, 1]."""
    w = vals[:, 0]
    if strategy == BLEND_STRATEGY:
        safe = jnp.where(w > 0, w, 1.0)
        return vals[:, 1:4] / safe[:, None]
    return vals[:, 1:4]


def pack_argb(rgb):
    """float rgb [0,1] -> uint32 ARGB with a=255 (reference Color32 semantics)."""
    q = jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint32)
    return (
        jnp.uint32(0xFF000000)
        | (q[:, 0] << 16)
        | (q[:, 1] << 8)
        | q[:, 2]
    )
