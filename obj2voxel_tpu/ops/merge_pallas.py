"""Merge-path merge of pre-sorted runs as a Pallas TPU kernel.

Round-5 replacement for the slab merge's initial 5-operand `lax.sort`: the
merge input is a dense concatenation of per-pass compacted outputs, and each
of those runs is ALREADY key-sorted (engine pass tails sort or exact-pack in
key order), so a full bitonic re-sort of the concat does ~log2(P)x redundant
work -- measured 16-34 ms per 2^22/2^23 rows on the chip, the largest merge
stage (probes/profile_merge.py).  This module merges S sorted runs in
ceil(log2(S)) linear passes instead:

  * runs are laid out at BLOCK-ALIGNED offsets (multiples of the kernel's
    block size N) so no output block ever straddles a merge-node boundary;
    the alignment gaps are INVALID_KEY rows, which are legitimate +inf
    elements that ride through the tree and land on the final tail
  * per level, a tiny jnp binary search computes the classic merge-path cut
    of every N-row output block (left-priority on key ties = stable merge,
    matching the stream order the stable `lax.sort` used to give MAX
    tie-breaking, reference util.hpp:167-172)
  * the level kernel DMAs the two N-row input windows of each block at their
    dynamic element offsets (lane-aligned in-register with a dynamic
    `pltpu.roll`, the flush_exact pattern from ops/pack_pallas.py), then
    merges them in VMEM with Batcher's odd-even merge network -- log2(N)+1
    compare-exchange stages of static flat shifts -- carrying a LOCAL index
    channel so every comparison is strict (window order = buffer order =
    stream order; the (key, idx) lexicographic compare makes any correct
    network produce the unique stable merge)
  * one-sided blocks (everything consumed from one child -- the common case
    against alignment padding and for disjoint key ranges) skip the network
    entirely and copy their window through

The output is the full stable sort of the buffer (live keys ascending, all
INVALID rows at the tail), bit-identical to
`lax.sort((keys,) + chans, num_keys=1, is_stable=True)` given the run
layout invariant (tests/test_merge_pallas.py checks exactly that equality).

Reference context: replaces the sort half of `VoxelMap::merge`
(reference src/voxelization.cpp:528-536); no direct reference counterpart --
hash maps never sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pack_pallas import _shift_next, _shift_prev

#: in-kernel sentinel (plain int; matches ops/combine.INVALID_KEY)
_INV = (1 << 31) - 1

#: extra scratch rows per window so the dynamic-offset DMA's sublane count
#: stays a multiple of 8 and the lane-alignment roll can borrow the next row
_WIN_PAD = 8


def pick_block(total_rows: int) -> int:
    """Kernel block size N for a merge of `total_rows` buffer rows: large
    blocks amortize per-block DMA latency, small blocks bound the alignment
    waste (< N rows per run); both are powers of two."""
    n = 1024
    while n < 32768 and n * 8 <= total_rows:
        n *= 2
    return n


def plan_runs(counts, n_block):
    """Host-side layout of S runs at N-aligned offsets.

    counts: live row count per run (python ints).
    Returns (aligned_offsets list of len S+1, levels, spad): run i occupies
    [off[i], off[i+1]) with its live prefix first and INVALID alignment
    padding after; spad-S empty runs are implied at the end."""
    offs = [0]
    for c in counts:
        offs.append(offs[-1] + -(-int(c) // n_block) * n_block)
    s = len(counts)
    spad = 1
    levels = 0
    while spad < max(s, 1):
        spad *= 2
        levels += 1
    return offs, levels, spad


def build_aoff(offs, spad, p):
    """(spad+1,) aligned-offset array for merge_runs_pallas: real run offsets,
    implied empty runs at p, and the tail region [aligned_total, p) attached
    to the last region so every buffer row belongs to some node."""
    s = len(offs) - 1
    a = list(offs) + [p] * (spad - s)
    a[spad] = p
    if s == spad:
        a[s] = p
    return np.asarray(a, np.int32)


def _flat_pos(rows):
    return (
        jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    )


def _batcher_merge(key, idx, chans, n):
    """Batcher odd-even merge of two ascending n-element halves of a flat
    (2n // 128, 128) buffer; (key, idx) lexicographic compare-exchange.
    Validated against a stable-sort oracle in /tmp-sim and
    tests/test_merge_pallas.py."""
    rows = key.shape[0]
    two_n = rows * 128
    assert two_n == 2 * n
    m = _flat_pos(rows)
    arrs = [key, idx] + list(chans)
    k = n
    while k >= 1:
        if k == n:
            mask_lo = m < n
        else:
            mask_lo = (((m // k) & 1) == 1) & (m + k < two_n)
        nxt = [_shift_next(a, k) for a in arrs]
        swap = mask_lo & (
            (nxt[0] < arrs[0])
            | ((nxt[0] == arrs[0]) & (nxt[1] < arrs[1]))
        )
        swap_p = (_shift_prev(swap.astype(jnp.int32), k) != 0) & (m >= k)
        prv = [_shift_prev(a, k) for a in arrs]
        arrs = [
            jnp.where(swap_p, p, jnp.where(swap, nx, a))
            for a, nx, p in zip(arrs, nxt, prv)
        ]
        k //= 2
    return arrs[0], arrs[2:]


def _make_level_kernel(n_chan, s_out):
    """One merge-tree level: grid g over N-row output blocks; prefetch rows
    [lstart, rstart, lvalid, rvalid, rcons] per block."""
    n_arr = 1 + n_chan
    s_scr = s_out + _WIN_PAD
    n = s_out * 128

    def kernel(pref_ref, *refs):
        in_refs = refs[:n_arr]
        out_refs = refs[n_arr : 2 * n_arr]
        scr = refs[2 * n_arr :]
        wa = scr[:n_arr]
        wb = scr[n_arr : 2 * n_arr]
        sems = scr[2 * n_arr]
        g = pl.program_id(0)
        ls = pref_ref[0, g]
        rs = pref_ref[1, g]
        lvalid = pref_ref[2, g]
        rvalid = pref_ref[3, g]
        rcons = pref_ref[4, g]

        lrow, lc = ls // 128, ls % 128
        rrow, rc = rs // 128, rs % 128
        copies = []
        for j in range(n_arr):
            cpa = pltpu.make_async_copy(
                in_refs[j].at[pl.ds(lrow, s_scr), :], wa[j], sems.at[2 * j]
            )
            cpb = pltpu.make_async_copy(
                in_refs[j].at[pl.ds(rrow, s_scr), :], wb[j], sems.at[2 * j + 1]
            )
            cpa.start()
            cpb.start()
            copies += [cpa, cpb]
        for cp in copies:
            cp.wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (s_scr, 128), 1)

        def align(x, c):
            # y flat[p] = x flat[p + c] over row-major (s_scr, 128)
            a = pltpu.roll(x, (128 - c) % 128, 1)
            b = pltpu.roll(a, s_scr - 1, 0)
            return jnp.where(lane < 128 - c, a, b)[:s_out]

        A = [align(wa[j][...], lc) for j in range(n_arr)]
        B = [align(wb[j][...], rc) for j in range(n_arr)]

        @pl.when(rcons == 0)
        def _():
            for j in range(n_arr):
                out_refs[j][...] = A[j]

        @pl.when(rcons == n)
        def _():
            for j in range(n_arr):
                out_refs[j][...] = B[j]

        @pl.when((rcons > 0) & (rcons < n))
        def _():
            pos = _flat_pos(s_out)
            big = jnp.int32(_INV)
            ka = jnp.where(pos < lvalid, A[0], big)
            ia = jnp.where(pos < lvalid, pos, 2 * n)
            kb = jnp.where(pos < rvalid, B[0], big)
            ib = jnp.where(pos < rvalid, pos + n, 2 * n)
            key = jnp.concatenate([ka, kb], axis=0)
            idx = jnp.concatenate([ia, ib], axis=0)
            chans = [
                jnp.concatenate([A[j], B[j]], axis=0)
                for j in range(1, n_arr)
            ]
            mk, mc = _batcher_merge(key, idx, chans, n)
            out_refs[0][...] = mk[:s_out]
            for j in range(1, n_arr):
                out_refs[j][...] = mc[j - 1][:s_out]

    return kernel


def _level_cuts(keys_flat, aoff, lev, spad, n_block, n_blocks, p_rows):
    """Merge-path cuts for every output block of one level (jnp, tiny).

    keys_flat: current buffer keys, flat; only indices < p_rows*128 are read.
    aoff: (spad+1,) int32 aligned run offsets (aoff[spad] = P).
    Returns (5, n_blocks) int32 [lstart, rstart, lvalid, rvalid, rcons]."""
    span = 1 << (lev + 1)
    starts = jax.lax.slice(aoff, (0,), (spad,), (span,))
    mids = jax.lax.slice(aoff, (span // 2,), (spad,), (span,))
    ends = jax.lax.slice(aoff, (span,), (spad + 1,), (span,))
    d_glob = jnp.arange(n_blocks, dtype=jnp.int32) * n_block
    node = (
        jnp.searchsorted(starts, d_glob, side="right").astype(jnp.int32) - 1
    )
    u0 = starts[node]
    u1 = mids[node]
    u2 = ends[node]
    d = d_glob - u0
    lo = jnp.maximum(0, d - (u2 - u1))
    hi = jnp.minimum(d, u1 - u0)
    p_max = jnp.int32(p_rows * 128 - 1)

    def body(_, lohi):
        lo, hi = lohi
        active = lo < hi
        mid = (lo + hi) // 2
        a = keys_flat[jnp.clip(u0 + mid, 0, p_max)]
        j = d - mid - 1
        b = keys_flat[jnp.clip(u1 + j, 0, p_max)]
        cond = jnp.where(j >= (u2 - u1), False, jnp.where(j < 0, True, a > b))
        hi = jnp.where(active & cond, mid, hi)
        lo = jnp.where(active & ~cond, mid + 1, lo)
        return lo, hi

    lo, _ = jax.lax.fori_loop(0, 26, body, (lo, hi))
    ls = u0 + lo
    rs = u1 + (d - lo)
    lvalid = u1 - ls
    rvalid = u2 - rs
    same = jnp.concatenate([node[1:] == node[:-1], jnp.zeros((1,), bool)])
    rs_next = jnp.concatenate([rs[1:], rs[-1:]])
    rcons = jnp.where(same, rs_next - rs, u2 - rs).astype(jnp.int32)
    return jnp.stack(
        [ls.astype(jnp.int32), rs.astype(jnp.int32),
         lvalid.astype(jnp.int32), rvalid.astype(jnp.int32), rcons]
    )


def merge_runs_pallas(keys, chans, aoff, *, p, n_block, levels, spad,
                      interpret=False):
    """Stable-sort a buffer of aligned sorted runs (module docstring).

    keys:  (PB,) int32 with PB = p + (n_block//128 + _WIN_PAD)*128 slack
           elements (slack content is junk; it is read but never selected).
    chans: tuple of (PB,) float32.
    aoff:  (spad+1,) int32 aligned run offsets, aoff[spad] == p.
    p, n_block, levels, spad: static layout parameters (plan_runs).
    Returns (keys, chans) flat (PB,) whose first p elements are the stable
    sort of the input's first p elements; the slack tail is junk."""
    n_arr = 1 + len(chans)
    s_out = n_block // 128
    s_scr = s_out + _WIN_PAD
    pb = keys.shape[0]
    rows = pb // 128
    assert pb == rows * 128 and rows == p // 128 + s_scr, (pb, p, n_block)
    n_blocks = p // n_block

    bufs = [keys.reshape(rows, 128)] + [c.reshape(rows, 128) for c in chans]
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    # index maps under PrefetchScalarGridSpec also receive the scalar refs
    out_spec = pl.BlockSpec(
        (s_out, 128), lambda g, pref: (g, 0), memory_space=pltpu.VMEM
    )
    kern = _make_level_kernel(len(chans), s_out)
    for lev in range(levels):
        pref = _level_cuts(
            bufs[0].reshape(-1), aoff, lev, spad, n_block, n_blocks, rows
        )
        bufs = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_blocks,),
                in_specs=[any_spec] * n_arr,
                out_specs=tuple([out_spec] * n_arr),
                scratch_shapes=(
                    [pltpu.VMEM((s_scr, 128), b.dtype) for b in bufs] * 2
                    + [pltpu.SemaphoreType.DMA((2 * n_arr,))]
                ),
            ),
            out_shape=tuple(
                jax.ShapeDtypeStruct((rows, 128), b.dtype) for b in bufs
            ),
            interpret=interpret,
        )(pref, *bufs)
        bufs = list(bufs)
    flat = [b.reshape(-1) for b in bufs]
    return flat[0], tuple(flat[1:])


def merge_runs_ref(keys, chans, p):
    """NumPy stable-sort oracle for the first p elements."""
    keys = np.asarray(keys)[:p]
    order = np.argsort(keys, kind="stable")
    return keys[order], tuple(np.asarray(c)[:p][order] for c in chans)
