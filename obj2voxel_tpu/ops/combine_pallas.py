"""Pallas TPU kernel for the post-sort segmented combine.

After the multi-operand sort, equal voxel keys form contiguous runs.  The
XLA epilogue used `jax.lax.associative_scan` (log2(P) full-array sweeps,
11.5 ms at 2^21 pairs, probes/probe_r2.out) to reduce each run.  This kernel
does it in ONE streaming pass: the TPU Pallas grid executes sequentially on a
core and scratch persists across steps, so a run carry flows block to block
while each block reduces its runs with log2(S) in-register shifted combines.

Outputs are "tail-marked": the last element of every run holds the combined
value and keeps its key; every other slot gets INVALID_KEY.  A cheap
non-stable sort afterwards compacts the survivors (ops/combine.py).

Semantics match ops/combine._segment_combine exactly:
  * blend: elementwise sum of premultiplied (w, wr, wg, wb);
  * max:   keep the entry with strictly greater weight; ties keep the
           EARLIER element (reference src/util.hpp:159-172).

Run tails are detected against the *global* successor key: each grid step
receives the first key of the NEXT block as a scalar (SMEM array indexed by
program id), so a run ending exactly at a block boundary emits from the block
that owns its last element and the carry for a continuing run is never
dropped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .combine import INVALID_KEY

#: plain-int sentinel for in-kernel use (a jnp constant would be captured)
_INV = (1 << 31) - 1

#: elements per grid step: SUB sublanes x 128 lanes.
SUB = 16
BLOCK = SUB * 128


def _shift_prev(x, d):
    """Element at linear (row-major) distance d before each position.

    x: (SUB, 128).  Positions p < d wrap around; callers mask those.
    """
    row, lane = divmod(d, 128)
    if lane == 0:
        return pltpu.roll(x, row, 0)
    a = pltpu.roll(x, lane, 1)
    a1 = pltpu.roll(a, row, 0)
    a2 = pltpu.roll(a, row + 1, 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    return jnp.where(lane_ids < lane, a2, a1)


def _kernel(blend_ref, nextk_ref, k_ref, w_ref, r_ref, g_ref, b_ref,
            ok_ref, ow_ref, or_ref, og_ref, ob_ref,
            cvals_ref, ckey_ref):
    i = pl.program_id(0)
    blend = blend_ref[0] != 0

    k = k_ref[...]
    vals = [w_ref[...], r_ref[...], g_ref[...], b_ref[...]]

    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    )

    @pl.when(i == 0)
    def _():
        ckey_ref[0] = _INV
        for j in range(4):
            cvals_ref[j] = jnp.float32(0)

    # --- in-block segmented inclusive scan (Hillis-Steele) ------------------
    d = 1
    while d < BLOCK:
        pk = _shift_prev(k, d)
        same = (pk == k) & (pos >= d)
        pvals = [_shift_prev(v, d) for v in vals]
        summed = [jnp.where(same, v + p, v) for v, p in zip(vals, pvals)]
        # max-by-weight; the earlier (prev) element wins ties
        take_prev = pvals[0] >= vals[0]
        maxed = [jnp.where(same & take_prev, p, v) for v, p in zip(vals, pvals)]
        vals = [jnp.where(blend, s, m) for s, m in zip(summed, maxed)]
        d *= 2

    # --- fold the incoming carry into the first run --------------------------
    carry_key = ckey_ref[0]
    carry_vals = [cvals_ref[j] for j in range(4)]
    do_fold = (k == k[0, 0]) & (carry_key == k[0, 0])
    folded_sum = [jnp.where(do_fold, v + c, v) for v, c in zip(vals, carry_vals)]
    keep_carry = carry_vals[0] >= vals[0]  # carry is earlier; wins ties
    folded_max = [
        jnp.where(do_fold & keep_carry, jnp.full_like(v, c), v)
        for v, c in zip(vals, carry_vals)
    ]
    vals = [jnp.where(blend, s, m) for s, m in zip(folded_sum, folded_max)]

    # --- tails against the global successor key ------------------------------
    nk = pltpu.roll(k, 127, 1)  # k[s, l+1] for l < 127
    nk_rows = pltpu.roll(nk, SUB - 1, 0)  # k[s+1, 0] at lane 127
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    next_k = jnp.where(lane_ids == 127, nk_rows, nk)
    next_k = jnp.where(pos == BLOCK - 1, nextk_ref[i], next_k)
    tail = (k != next_k) & (k != _INV)

    ok_ref[...] = jnp.where(tail, k, _INV)
    ow_ref[...] = jnp.where(tail, vals[0], 0.0)
    or_ref[...] = jnp.where(tail, vals[1], 0.0)
    og_ref[...] = jnp.where(tail, vals[2], 0.0)
    ob_ref[...] = jnp.where(tail, vals[3], 0.0)

    # --- new carry: the block's last element (inclusive, carry folded) ------
    ckey_ref[0] = k[SUB - 1, 127]
    for j in range(4):
        cvals_ref[j] = vals[j][SUB - 1, 127]


@functools.partial(jax.jit, static_argnames=("interpret",))
def segment_combine_pallas(sorted_keys, w, r, g, b, is_blend, interpret=False):
    """Tail-marked segmented combine of a key-sorted pair stream.

    sorted_keys: (P,) int32 (INVALID_KEY runs sort last); w/r/g/b: (P,) f32
    premultiplied channels; is_blend: traced bool.
    Returns (keys', w', r', g', b') where run tails keep their key and
    combined value and every other slot is (INVALID_KEY, 0).
    P must be a multiple of 2048.
    """
    P = sorted_keys.shape[0]
    assert P % BLOCK == 0, P
    grid = P // BLOCK

    def r2(x):
        return x.reshape(P // 128, 128)

    blend = jnp.asarray(is_blend, jnp.int32).reshape(1)
    # first key of the following block, INVALID after the last element
    next_first = jnp.concatenate(
        [sorted_keys[BLOCK::BLOCK], jnp.full((1,), INVALID_KEY, jnp.int32)]
    )

    spec = pl.BlockSpec((SUB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[smem, smem, spec, spec, spec, spec, spec],
        out_specs=(spec, spec, spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((P // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((P // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((P // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((P // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((P // 128, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.SMEM((4,), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(
        blend,
        next_first,
        r2(sorted_keys),
        r2(w), r2(r), r2(g), r2(b),
    )
    return tuple(o.reshape(P) for o in outs)
