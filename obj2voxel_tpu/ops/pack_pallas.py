"""Order-preserving stream compaction (prefix pack) as a Pallas TPU kernel.

Round-4 replacement for the per-pass compaction SORT: after the fused pass
kernel, a pass's live pairs (w > 0) must reach the slab merge as a dense
prefix, but the merge re-sorts its whole input anyway, so per-pass we only
need COMPACTION, not key ordering.  `ops.combine.compact_channels` used a
5-operand stable bitonic sort for this (~6.3 ms per 2^21 slots on the chip,
the largest pass stage after the fused kernel, and superlinear in the budget
-- the reason the 2^22/2^23 budget rungs lost end-to-end, BASELINE.md).  This
kernel compacts in LINEAR time:

  * per (SUB x 128) block, an in-register binary-shift pack: 13 log-steps of
    roll+select move every live element left by its hole count (the classic
    SIMD stream-compaction scheme: process hole-count bits LSB->MSB; at step
    k an element moves 2^k left iff bit k of its remaining hole count is
    set -- collision-free because surviving hole counts are multiples of 2^k)
  * blocks land densely via the sequential TPU grid: a running row offset in
    SMEM scratch; each block DMAs its FULL (SUB, 128) compacted tile (live
    prefix + INVALID/zero fill) to the output at its dynamic row offset, and
    because a block adds at most SUB rows, the next block's write starts
    inside the previous tile and overwrites its fill -- the defined region
    [0, count) is the exact dense concatenation of per-block live prefixes,
    each padded to a 128-slot row boundary.

Output contract: (keys', chans', count) where count is a multiple of 128;
rows [0, count) hold every live input element in INPUT ORDER (so the merge's
stable sort sees pairs in exactly the stream order compact_channels gave it
-- MAX tie-breaking is preserved bit-for-bit) with < 128 INVALID/zero filler
slots per input block; rows PAST count (beyond the last block's tile) are
UNDEFINED -- consumers must mask or slice by count (engine._make_assembler
masks; the final yield slices).  Ordering differs from compact_channels only
in that live pairs stay in slot order instead of key order; both orders make
the downstream merge produce bit-identical results (tests/test_pack_pallas).

The per-block 128-slot rounding wastes < SUB*128/BLOCK = 1.6% of live rows
at 25% occupancy, versus the sort's zero -- irrelevant next to the ~5x stage
speedup and the linear scaling that unlocks 2^22+ budgets.

Reference context: this replaces the compaction half of the reference's
VoxelMap hash scatter (reference src/util.hpp:179-208); there is no direct
reference counterpart because hash maps are always dense.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .combine import INVALID_KEY

#: in-kernel sentinel (plain int; ops/combine.INVALID_KEY as jnp would be
#: captured as a traced constant)
_INV = (1 << 31) - 1

#: slots per grid step, laid out (SUB, 128)
SUB = 64
BLOCK = SUB * 128

#: extra staging rows for the exact-pack flush: the tile is (SUB + _SPILL_PAD)
#: rows so the DMA's sublane count stays a multiple of 8 -- Mosaic ACCEPTS a
#: (SUB + 1)-row dynamic-offset DMA at compile time but dies with a runtime
#: INTERNAL error on the chip (probes/probe_pack_exact_bisect.py stage A vs
#: A72); row SUB is the spill row, rows SUB+1.. are fill
_SPILL_PAD = 8


def _shift_prev(x, d):
    """y[p] = x[p - d] in row-major flat order over (S, 128); positions
    p < d wrap around (callers mask)."""
    S = x.shape[0]
    row, lane = divmod(d, 128)
    if lane == 0:
        return pltpu.roll(x, row % S, 0)
    a = pltpu.roll(x, lane, 1)
    a1 = pltpu.roll(a, row % S, 0)
    a2 = pltpu.roll(a, (row + 1) % S, 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane_ids >= lane, a1, a2)


def _shift_next(x, d):
    """y[p] = x[p + d] in row-major flat order over (S, 128); positions
    p >= S*128 - d wrap around (callers mask)."""
    S = x.shape[0]
    row, lane = divmod(d, 128)
    if lane == 0:
        return pltpu.roll(x, (S - row) % S, 0)
    a = pltpu.roll(x, 128 - lane, 1)
    a1 = pltpu.roll(a, (S - row) % S, 0)
    a2 = pltpu.roll(a, (S - row - 1) % S, 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane_ids < 128 - lane, a1, a2)


def pack_block(live_i32, payload):
    """In-register order-preserving compaction of one (S, 128) block.

    live_i32: (S, 128) int32 0/1 live flags.
    payload:  list of (S, 128) arrays (int32 or float32) to move with the
              flags.

    Returns (packed payload list, n) where n is the scalar live count: flat
    positions p < n hold the live elements in input order; positions >= n
    hold junk the caller must overwrite (mask with flat iota < n).
    """
    S = live_i32.shape[0]
    n_slots = S * 128
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    )

    # flat inclusive cumsum of the live flags (Hillis-Steele)
    c = live_i32
    d = 1
    while d < n_slots:
        c = c + jnp.where(pos >= d, _shift_prev(c, d), 0)
        d *= 2
    n = c[S - 1, 127]

    # holes before each live element = distance it must move left
    hb = pos - (c - 1)

    arrs = list(payload)
    d = 1
    while d < n_slots:
        live_n = _shift_next(live_i32, d)
        hb_n = _shift_next(hb, d)
        moved_in = (live_n != 0) & ((hb_n & d) != 0) & (pos < n_slots - d)
        moved_out = (live_i32 != 0) & ((hb & d) != 0)
        arrs = [jnp.where(moved_in, _shift_next(a, d), a) for a in arrs]
        hb = jnp.where(moved_in, hb_n - d, hb)
        live_i32 = jnp.where(moved_in, 1, jnp.where(moved_out, 0, live_i32))
        d *= 2
    return arrs, n


def flush_packed(packed, n, out_refs, fills, scratch, off_ref, sems, base=0):
    """Write one packed block to the outputs at the running row offset.

    packed: list of (S, 128) packed arrays (junk past flat position n).
    n:      scalar live count for this block.
    out_refs: list of full HBM refs shaped (rows, 128) (memory_space=ANY).
    fills:  per-array fill value for the junk region (INVALID key / 0.0).
    scratch: list of (S, 128) VMEM refs (DMA sources).
    off_ref: SMEM (1,) int32 running row offset (caller zeroes at step 0).
    sems:   DMA semaphore array ref, one slot per output.
    base:   static or scalar row offset added to the destination (batched
            kernels pack each batch element into its own row range).

    Returns the new within-range row offset (callers store it and derive
    count = off*128).  Writes the FULL (S, 128) tile at the dynamic row
    offset; the sequential grid makes the next block's write overwrite this
    tile's fill rows, so the defined output region stays dense (module
    docstring).
    """
    S = packed[0].shape[0]
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    )
    mask = pos < n
    off = off_ref[0]
    copies = []
    for j, (arr, ref, fill, sc) in enumerate(zip(packed, out_refs, fills, scratch)):
        sc[...] = jnp.where(mask, arr, fill)
        cp = pltpu.make_async_copy(sc, ref.at[pl.ds(base + off, S), :], sems.at[j])
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()
    rows = (n + 127) // 128
    return off + rows


def flush_exact(packed, n, out_refs, fills, carry, staging, off_ref, sems):
    """Element-exact streaming flush: the dense-output variant of
    `flush_packed` (no per-block 128-slot row padding).

    The logical output stream is the concatenation of every block's live
    prefix at ELEMENT granularity.  A (1, 128) VMEM carry row holds the
    trailing partial row between blocks; each block lane-rolls its packed
    tile by the carry length (dynamic `pltpu.roll`), merges the carry into
    row 0, and DMAs a full (S+1, 128) tile at the running row offset — the
    next block's write starts at the last FULL row, overwriting the partial
    row this block also wrote (which is correct-and-final if this turns out
    to be the last block).

    packed:  list of (S, 128) pack_block outputs (junk past flat pos n).
    n:       scalar live count for this block.
    out_refs: full HBM refs (rows, 128), rows >= ceil(P/128) + S + _SPILL_PAD
             (the final tile write may extend past the last live row).
    fills:   per-array junk fill (INVALID key / 0).
    carry:   list of (1, 128) VMEM refs (trailing partial row).
    staging: list of (S + _SPILL_PAD, 128) VMEM refs (DMA sources; row S is
             the spill row, rows S+1.. are fill padding that keeps the DMA's
             sublane count a multiple of 8 -- see _SPILL_PAD).
    off_ref: SMEM (2,) int32 [full rows written, carry length 0..127]
             (caller zeroes both at step 0).
    sems:    DMA semaphore array, one slot per output.

    After the final block, off_ref holds the EXACT element count as
    off[0] * 128 + off[1], and the carry row has already been written to
    HBM (fill-masked past the count) — rows past ceil(count/128) are junk
    the consumer must mask or slice."""
    S = packed[0].shape[0]
    row_off = off_ref[0]
    c = off_ref[1]
    total = c + n
    add_rows = total // 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128 + lane
    )
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    copies = []
    for j, (arr, ref, fill, cr, sc) in enumerate(
        zip(packed, out_refs, fills, carry, staging)
    ):
        a = pltpu.roll(arr, c, 1)          # a[r, l] = arr[r, (l - c) % 128]
        up = pltpu.roll(a, 1, 0)           # up[r] = a[r - 1]
        top = jnp.where(lane >= c, a, up)  # shifted right by c elements
        top = jnp.where(pos < c, jnp.broadcast_to(cr[...], (S, 128)), top)
        sc[0:S] = jnp.where(pos < total, top, fill)
        # spill row S: positions S*128 + l (< total only for l < c)
        sc[S : S + 1] = jnp.where(
            S * 128 + lane1 < total, a[S - 1 : S], fill
        )
        # fill padding rows (junk region; written for determinism)
        sc[S + 1 : S + _SPILL_PAD] = jnp.full(
            (_SPILL_PAD - 1, 128), fill, sc.dtype
        )
        cp = pltpu.make_async_copy(
            sc, ref.at[pl.ds(row_off, S + _SPILL_PAD), :], sems.at[j]
        )
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()
    # new carry = the (fill-masked) partial row the stream now ends in
    for cr, sc in zip(carry, staging):
        cr[...] = sc[pl.ds(add_rows, 1), :]
    off_ref[0] = row_off + add_rows
    off_ref[1] = total - add_rows * 128


def _make_pack_exact_kernel(n_arr, S):
    """Kernel: order-preserving EXACT compaction of n_arr parallel streams.

    Stream 0 is the int32 key array (liveness = key != _INV); the rest are
    payload (any 32-bit dtype)."""

    def kernel(*refs):
        in_refs = refs[:n_arr]
        out_refs = refs[n_arr : 2 * n_arr]
        cnt_ref = refs[2 * n_arr]
        scr = refs[2 * n_arr + 1 :]
        carry = scr[:n_arr]
        staging = scr[n_arr : 2 * n_arr]
        off_ref = scr[2 * n_arr]
        sems = scr[2 * n_arr + 1]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            off_ref[0] = 0
            off_ref[1] = 0

        k = in_refs[0][...]
        live = (k != _INV).astype(jnp.int32)
        packed, n = pack_block(live, [r[...] for r in in_refs])
        fills = [_INV] + [jnp.zeros((), r.dtype) for r in in_refs[1:]]
        flush_exact(packed, n, out_refs, fills, carry, staging, off_ref, sems)
        cnt_ref[0] = off_ref[0] * 128 + off_ref[1]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def pack_exact_pallas(keys, vals, interpret=False):
    """Compact (keys, *vals) to an EXACTLY dense live prefix.

    keys: (P,) int32 (INVALID_KEY = dead); vals: tuple of (P,) 32-bit arrays.
    P must be a multiple of BLOCK (8192).
    Returns (keys', vals' tuple, count): rows [0, count) are EXACTLY the live
    elements in input order — no filler slots (unlike `pack_channels_pallas`);
    rows past count are junk — mask or slice by count.
    """
    P = keys.shape[0]
    assert P % BLOCK == 0, P
    grid = P // BLOCK
    n_arr = 1 + len(vals)
    # final tile write may extend past the prefix
    rows = P // 128 + SUB + _SPILL_PAD

    def r2(x):
        return x.reshape(P // 128, 128)

    spec = pl.BlockSpec((SUB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    outs = pl.pallas_call(
        _make_pack_exact_kernel(n_arr, SUB),
        grid=(grid,),
        in_specs=[spec] * n_arr,
        out_specs=(any_spec,) * n_arr
        + (pl.BlockSpec(memory_space=pltpu.SMEM),),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, 128), a.dtype) for a in (keys, *vals)
        )
        + (jax.ShapeDtypeStruct((1,), jnp.int32),),
        scratch_shapes=[
            pltpu.VMEM((1, 128), a.dtype) for a in (keys, *vals)
        ]
        + [
            pltpu.VMEM((SUB + _SPILL_PAD, 128), a.dtype)
            for a in (keys, *vals)
        ]
        + [
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((n_arr,)),
        ],
        interpret=interpret,
    )(r2(keys), *(r2(v) for v in vals))
    cnt = outs[n_arr][0]
    flat = [o.reshape(-1)[:P] for o in outs[:n_arr]]
    return flat[0], tuple(flat[1:]), cnt


def pack_exact_ref(keys, vals):
    """NumPy oracle for pack_exact_pallas's defined region."""
    keys = np.asarray(keys)
    idx = np.nonzero(keys != _INV)[0]
    n = idx.size
    P = keys.shape[0]
    out_k = np.full(P, _INV, keys.dtype)
    out_k[:n] = keys[idx]
    outs = []
    for v in vals:
        v = np.asarray(v)
        o = np.zeros(P, v.dtype)
        o[:n] = v[idx]
        outs.append(o)
    return out_k, tuple(outs), n


def _pack_kernel(k_ref, w_ref, a_ref, b_ref, c_ref,
                 ok_ref, ow_ref, oa_ref, ob_ref, oc_ref, cnt_ref,
                 sk, sw, sa, sb, sc, off_ref, sems):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        off_ref[0] = 0

    k = k_ref[...]
    live = (k != _INV).astype(jnp.int32)
    packed, n = pack_block(
        live, [k, w_ref[...], a_ref[...], b_ref[...], c_ref[...]]
    )
    new_off = flush_packed(
        packed, n,
        [ok_ref, ow_ref, oa_ref, ob_ref, oc_ref],
        [_INV, 0.0, 0.0, 0.0, 0.0],
        [sk, sw, sa, sb, sc],
        off_ref, sems,
    )
    off_ref[0] = new_off
    cnt_ref[0] = new_off * 128


@functools.partial(jax.jit, static_argnames=("interpret",))
def pack_channels_pallas(keys, chans, interpret=False):
    """Compact a (keys, 4-channel) pair stream to a dense live prefix.

    keys: (P,) int32 (INVALID_KEY = dead); chans: 4-tuple of (P,) f32.
    P must be a multiple of BLOCK (8192).
    Returns (keys', chans' 4-tuple, count): rows [0, count) are the live
    pairs in input order (plus < 128 INVALID/zero fillers per input block);
    rows past count are UNDEFINED -- mask or slice by count.
    """
    P = keys.shape[0]
    assert P % BLOCK == 0, P
    grid = P // BLOCK

    def r2(x):
        return x.reshape(P // 128, 128)

    spec = pl.BlockSpec((SUB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    f32 = jax.ShapeDtypeStruct((P // 128, 128), jnp.float32)
    outs = pl.pallas_call(
        _pack_kernel,
        grid=(grid,),
        in_specs=[spec] * 5,
        out_specs=(any_spec,) * 5 + (pl.BlockSpec(memory_space=pltpu.SMEM),),
        out_shape=(
            jax.ShapeDtypeStruct((P // 128, 128), jnp.int32),
            f32, f32, f32, f32,
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((SUB, 128), jnp.int32),
            pltpu.VMEM((SUB, 128), jnp.float32),
            pltpu.VMEM((SUB, 128), jnp.float32),
            pltpu.VMEM((SUB, 128), jnp.float32),
            pltpu.VMEM((SUB, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
        interpret=interpret,
    )(r2(keys), r2(chans[0]), r2(chans[1]), r2(chans[2]), r2(chans[3]))
    k, w, r, g, b, cnt = outs
    return (
        k.reshape(P),
        (w.reshape(P), r.reshape(P), g.reshape(P), b.reshape(P)),
        cnt[0],
    )


def pack_channels_ref(keys, chans):
    """NumPy oracle for the kernel's DEFINED output region.

    Returns (keys', chans', count) with the same block-prefix layout; rows
    past count are INVALID/0 here (the kernel leaves them undefined).
    """
    keys = np.asarray(keys)
    chans = [np.asarray(c) for c in chans]
    P = keys.shape[0]
    assert P % BLOCK == 0
    out_k = np.full(P, _INV, np.int32)
    out_c = [np.zeros(P, np.float32) for _ in chans]
    off = 0
    for b in range(P // BLOCK):
        sl = slice(b * BLOCK, (b + 1) * BLOCK)
        idx = np.nonzero(keys[sl] != _INV)[0]
        n = idx.size
        out_k[off:off + n] = keys[sl][idx]
        for j, c in enumerate(chans):
            out_c[j][off:off + n] = c[sl][idx]
        off += ((n + 127) // 128) * 128
    return out_k, tuple(out_c), off
