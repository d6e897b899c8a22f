"""Per-voxel combine: sort by voxel key + segmented scan.

This replaces the reference's per-worker `VoxelMap` hash scatter and
`insertWeighted` combine (reference: src/util.hpp:179-208,
src/voxelization.cpp:56-69, 513-536) with the TPU-idiomatic equivalent: a
stable sort of the (voxel_key, weight, color) pair stream followed by a
segmented associative scan and a compaction of segment tails.

Value layout is ALWAYS premultiplied and CHANNEL-MAJOR: a `chans` tuple of
four (P,) f32 arrays (w, w*r, w*g, w*b).  Round 2 carried values as (P, 4)
arrays; on TPU that puts the 4-wide channel axis in the LANE dimension (4/128
occupancy), and concatenating such arrays for a merge measured 87 ms per 2^22
rows vs 1.7 ms channel-major (probes/profile_merge.py) -- the entire round-2
merge overhead.  Channels also feed the 5-operand sort directly with no
stack/unstack relayouts.

Both color strategies share one executable with the strategy as a *traced*
scalar:

  * BLEND -- running weighted mean (reference util.hpp:159-165) == elementwise
             sum of premultiplied values, divided once at the end.
  * MAX   -- keep the entry with the strictly greater weight; ties keep the
             earlier entry (reference util.hpp:167-172, lhs = new value).  A
             stable sort preserves stream order and the scan keeps the
             leftmost maximum, matching that; rgb is recovered as c/w at
             finalize (exact to well below 8-bit color quantization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import BLEND_STRATEGY

#: Sentinel key for invalid / zero-weight pairs; sorts to the end.
INVALID_KEY = jnp.int32(2**31 - 1)


def premultiply(weight, rgb):
    """(w (P,), rgb (P, 3)) -> channel tuple (w, w*r, w*g, w*b)."""
    return (weight, weight * rgb[:, 0], weight * rgb[:, 1], weight * rgb[:, 2])


def sort_channels(keys, chans, is_stable=True):
    """Multi-operand stable sort of the 4 value channels by int32 keys.

    Measured on the TPU (probes/probe_r2.out): the 5-operand `lax.sort` runs
    3.6x faster than sort-(key, iota)-then-gather at 2^21 pairs -- gathers,
    even permutation gathers, are the slow primitive.
    """
    sk, w, r, g, b = jax.lax.sort(
        (keys,) + tuple(chans), num_keys=1, is_stable=is_stable
    )
    return sk, (w, r, g, b)


def _segment_combine(head, chans, is_blend):
    """Segmented left-to-right scan over sorted runs (jnp oracle).

    head: (P,) bool -- True at the first element of each key run.
    chans: 4-tuple of (P,) float32 premultiplied channels.
    is_blend: traced bool scalar.
    Returns channels where the *last* element of each run holds the combined
    value.
    """

    def op(ca, cb):
        fa, wa = ca[0], ca[1]
        fb, wb = cb[0], cb[1]
        summed = tuple(a + b for a, b in zip(ca[1:], cb[1:]))
        maxed = tuple(
            jnp.where(wb > wa, b, a) for a, b in zip(ca[1:], cb[1:])
        )
        merged = tuple(
            jnp.where(is_blend, s, m) for s, m in zip(summed, maxed)
        )
        out = tuple(jnp.where(fb, b, m) for b, m in zip(cb[1:], merged))
        return (fa | fb,) + out

    out = jax.lax.associative_scan(op, (head,) + tuple(chans))
    return out[1:]


def combine_sorted(sorted_keys, chans, is_blend):
    """Combine a key-sorted premultiplied stream into unique rows (jnp oracle).

    Returns (keys (P,), chans 4-tuple, count): the first `count` rows are the
    unique combined voxels (key-sorted); the rest is INVALID_KEY padding.

    Compaction runs as one more (non-stable) sort: non-tail rows get their key
    set to INVALID_KEY and sorting bubbles the unique combined rows to the
    front in key order.  Measured 3.1 ms at 2^21 vs 34 ms for the previous
    `jnp.nonzero` + gather compaction (probes/probe_r2.out).
    """
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sorted_keys[:-1]])
    head = sorted_keys != prev
    combined = _segment_combine(head, chans, is_blend)

    nxt = jnp.concatenate([sorted_keys[1:], jnp.full((1,), INVALID_KEY, jnp.int32)])
    tail = (sorted_keys != nxt) & (sorted_keys != INVALID_KEY)

    count = jnp.sum(tail.astype(jnp.int32))
    tail_keys = jnp.where(tail, sorted_keys, INVALID_KEY)
    masked = tuple(jnp.where(tail, c, 0.0) for c in combined)
    # keys are unique among the live rows, so stability is irrelevant
    out_keys, out_chans = sort_channels(tail_keys, masked, is_stable=False)
    return out_keys, out_chans, count


def compact_channels(keys, chans):
    """Stable-sort by key and count live rows WITHOUT combining duplicates.

    The fast tail for multi-pass slabs (engine._bucket_pass finalize=False):
    the slab merge re-sorts and deduplicates anyway, so the per-pass
    segmented combine + second compaction sort (~15 ms per 2^21-slot pass on
    the chip) are redundant work.  One stable sort both compacts INVALID_KEY
    rows to the tail and keeps duplicate keys in slot order, so the merge's
    stable concat-order sort sees pairs in exactly the global stream order —
    MAX tie-breaking ("earliest stream element wins", reference
    util.hpp:167-172) is preserved bit-for-bit.  BLEND partial sums are
    grouped differently than with per-pass combining (all pairs summed at the
    merge instead of pass-partials-then-merge); the result differs only in
    float association, which the fidelity contract already scopes out
    (PARITY.md "Fidelity scope").

    count = live PAIRS (not unique voxels) — callers only use it to bound the
    slice fed to the merge.
    """
    sorted_keys, schans = sort_channels(keys, chans)
    count = jnp.sum((sorted_keys != INVALID_KEY).astype(jnp.int32))
    return sorted_keys, schans, count


def _combine_sorted_kernel(sorted_keys, chans, is_blend, interpret=False):
    """Run-tail combine via the streaming Pallas kernel + compaction.

    Round 4: the tail compaction is the EXACT pack kernel
    (ops/pack_pallas.pack_exact_pallas, linear time) instead of a second
    5-operand sort — the sort cost 33.6 ms per 2^23 rows on the chip
    (probes/profile_merge.py), the largest merge stage after the initial
    sort.  The tail-marked stream is already key-ordered and pack preserves
    order, so the output contract (key-sorted dense live prefix + count) is
    unchanged; rows past count are junk (the INVALID/zero tail the sort used
    to produce is only ever consumed through [:count] slices or INVALID-key
    masks downstream)."""
    from .combine_pallas import segment_combine_pallas
    from .pack_pallas import BLOCK as _PACK_BLOCK, pack_exact_pallas

    tk, tw, tr, tg, tb = segment_combine_pallas(
        sorted_keys, chans[0], chans[1], chans[2], chans[3], is_blend,
        interpret=interpret,
    )
    if sorted_keys.shape[0] % _PACK_BLOCK == 0:
        ok, vs, count = pack_exact_pallas(
            tk, (tw, tr, tg, tb), interpret=interpret
        )
        # rows past count are UNDEFINED (unwritten pallas output memory for
        # sparse streams); restore the INVALID/zero-tail contract the
        # downstream full-buffer consumers rely on (merge assembler,
        # downscale re-merge) — one elementwise pass, ~0.3 ms per 2^23 rows
        # vs the 33.6 ms sort this replaces
        tail = jax.lax.iota(jnp.int32, ok.shape[0]) >= count
        ok = jnp.where(tail, INVALID_KEY, ok)
        vs = tuple(jnp.where(tail, 0.0, v) for v in vs)
        return ok, vs, count
    count = jnp.sum((tk != INVALID_KEY).astype(jnp.int32))
    ok, v0, v1, v2, v3 = jax.lax.sort(
        (tk, tw, tr, tg, tb), num_keys=1, is_stable=False
    )
    return ok, (v0, v1, v2, v3), count


def combine_pairs(keys, weight, rgb, is_blend, use_kernel=False):
    """Full combine of one pair stream: mask, premultiply, sort, reduce,
    compact.

    keys:   (P,) int32 linear voxel keys (INVALID_KEY allowed)
    weight: (P,) float32 clip weights; w <= 0 entries are dropped
            (reference voxelization.cpp:466 drops zero-weight UVs)
    rgb:    (P, 3) float32 colors
    is_blend: traced bool scalar (or python bool).
    use_kernel: static; route the segmented reduce through the Pallas kernel
            (TPU) instead of the associative-scan oracle.
    """
    live = weight > 0.0
    keys = jnp.where(live, keys, INVALID_KEY)
    return combine_channels(keys, premultiply(weight, rgb), is_blend, use_kernel)


def combine_presorted(sorted_keys, schans, is_blend, use_kernel=False,
                      interpret=False):
    """Reduce + compact an already key-sorted premultiplied stream (the
    post-sort half of `combine_channels`; also the entry point for streams
    sorted by ops/merge_pallas.merge_runs_pallas)."""
    if use_kernel and sorted_keys.shape[0] % 2048 == 0:
        return _combine_sorted_kernel(
            sorted_keys, schans, is_blend, interpret=interpret
        )
    return combine_sorted(sorted_keys, schans, is_blend)


def combine_channels(keys, chans, is_blend, use_kernel=False, stable=True):
    """Sort + reduce + compact a premultiplied channel stream (keys already
    INVALID_KEY-masked for dead entries, e.g. by the fused pass kernel).

    stable=False drops the sort's stability guarantee: valid ONLY for BLEND
    (segment sums are order-free up to float association, which PARITY.md's
    fidelity scope already excludes); MAX needs stream order for its
    earliest-wins tie-break (reference util.hpp:167-172)."""
    sorted_keys, schans = sort_channels(keys, chans, is_stable=stable)
    return combine_presorted(sorted_keys, schans, is_blend, use_kernel)


def merge_combined(keys, chans, is_blend, use_kernel=False, stable=True):
    """Merge concatenated compacted (keys, chans) lists: one more
    sort+combine."""
    return combine_channels(keys, chans, is_blend, use_kernel, stable=stable)


def downscale_keys(keys, stride):
    """2x2x2 downscale of slab-local linear keys (fixes the reference's broken
    Voxelizer::downscale, voxelization.cpp:538-554: each axis coordinate is
    halved, not the linear index).

    keys are x + stride*y + stride^2*z_local; the result is re-packed with
    stride//2 (slab z offsets are even, so z_local//2 stays slab-local).
    """
    s2 = stride // 2
    x = keys % stride
    y = (keys // stride) % stride
    zl = keys // (stride * stride)
    down = (zl // 2) * (s2 * s2) + (y // 2) * s2 + (x // 2)
    return jnp.where(keys == INVALID_KEY, INVALID_KEY, down).astype(jnp.int32)


def _exact_div(num, den):
    """num / den with one residual (Newton) correction: TPU lowers f32 divide
    to reciprocal + Newton, which can sit 1 ulp below the correctly rounded
    quotient and flip round-half boundaries in pack_argb (e.g. Kd 0.1 ->
    byte 25 on device vs 26 on the CPU oracle / the reference's exact IEEE
    divide)."""
    q = num / den
    return q + (num - q * den) / den


def finalize_colors(chans):
    """Premultiplied channels -> (r, g, b) float tuples in [0, 1]."""
    w = chans[0]
    safe = jnp.where(w > 0, w, 1.0)
    return tuple(_exact_div(c, safe) for c in chans[1:4])


def pack_argb(rgb_chans):
    """(r, g, b) float channel tuple [0,1] -> (P,) uint32 ARGB with a=255
    (reference Color32 semantics)."""
    q = [
        jnp.clip(jnp.round(c * 255.0), 0, 255).astype(jnp.uint32)
        for c in rgb_chans
    ]
    return jnp.uint32(0xFF000000) | (q[0] << 16) | (q[1] << 8) | q[2]
