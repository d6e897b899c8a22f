"""Bisect the pack_exact_pallas device INTERNAL error.

pack_exact_pallas passes interpret tests but dies with `TPU backend error
(Internal)` on the chip (probe_pack_exact_dev.py) while flush_packed (the
block-prefix variant, same DMA pattern at S=64 rows) runs fine in the fused
pass.  Each stage below isolates one delta; run on device.
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from obj2voxel_tpu.ops.pack_pallas import (
    BLOCK, SUB, _INV, _SPILL_PAD, pack_block, flush_exact, pack_exact_ref,
)

S = SUB


def stage(name, fn):
    try:
        ok = fn()
        print(f"{name}: {'OK' if ok else 'MISMATCH'}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: RAISED {type(e).__name__}: {str(e)[:200]}", flush=True)


def stage_a():
    """65-row DMA: (S+1,128) VMEM scratch -> ANY output at dynamic offset."""
    def kern(s_ref, x_ref, o_ref, sc, sem):
        off = s_ref[0]
        sc[0:S] = x_ref[...]
        sc[S:S + 1] = x_ref[0:1]
        cp = pltpu.make_async_copy(sc, o_ref.at[pl.ds(off, S + 1), :], sem)
        cp.start()
        cp.wait()

    x = jnp.arange(S * 128, dtype=jnp.int32).reshape(S, 128)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((S + 9, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((S + 1, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )(jnp.asarray([3], jnp.int32), x)
    got = np.asarray(out)
    return (np.array_equal(got[3:3 + S], np.asarray(x))
            and np.array_equal(got[3 + S], np.asarray(x)[0]))


def stage_b():
    """Dynamic lane roll + row-shift + carry broadcast merge (compute only)."""
    def kern(s_ref, x_ref, cr_ref, o_ref):
        c = s_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128 + lane
        a = pltpu.roll(x_ref[...], c, 1)
        up = pltpu.roll(a, 1, 0)
        top = jnp.where(lane >= c, a, up)
        top = jnp.where(pos < c, jnp.broadcast_to(cr_ref[...], (S, 128)), top)
        o_ref[...] = top

    x = np.arange(S * 128, dtype=np.int32).reshape(S, 128)
    carry = np.full((1, 128), -7, np.int32)
    c = 37
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
    )(jnp.asarray([c], jnp.int32), jnp.asarray(x), jnp.asarray(carry))
    ref = np.empty((S, 128), np.int32)
    flat = ref.reshape(-1)
    flat[:c] = -7
    flat[c:] = x.reshape(-1)[: S * 128 - c]
    return np.array_equal(np.asarray(out), ref)


def stage_c():
    """Dynamic sublane read from VMEM SCRATCH (carry extraction)."""
    def kern(s_ref, x_ref, o_ref, sc):
        r = s_ref[0]
        sc[...] = x_ref[...]
        o_ref[...] = sc[pl.ds(r, 1), :]

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
    )(jnp.asarray([5], jnp.int32), x)
    return np.array_equal(np.asarray(out), np.asarray(x)[5:6])


def _exact_kern_1(k_ref, o_ref, cnt_ref, cr, sc, off_ref, sem):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        off_ref[0] = 0
        off_ref[1] = 0

    k = k_ref[...]
    live = (k != _INV).astype(jnp.int32)
    packed, n = pack_block(live, [k])
    flush_exact(packed, n, [o_ref], [_INV], [cr], [sc], off_ref, sem)
    cnt_ref[0] = off_ref[0] * 128 + off_ref[1]


def _run_exact_keys(nblocks):
    P = nblocks * BLOCK
    rng = np.random.RandomState(1)
    keys = rng.randint(0, 1 << 28, P).astype(np.int32)
    keys[rng.rand(P) > 0.37] = _INV
    rows = P // 128 + S + _SPILL_PAD
    outs = pl.pallas_call(
        _exact_kern_1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((S, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((rows, 128), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.VMEM((S + _SPILL_PAD, 128), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )(keys.reshape(P // 128, 128))
    cnt = int(outs[1][0])
    rk, _, rcnt = pack_exact_ref(keys, ())
    if cnt != rcnt:
        print(f"  count {cnt} != ref {rcnt}")
        return False
    return np.array_equal(np.asarray(outs[0]).reshape(-1)[:cnt], rk[:cnt])


STAGES = {
    "A": ("A 65-row dyn-offset DMA", stage_a),
    "B": ("B dyn lane roll + carry merge", stage_b),
    "C": ("C dyn sublane read from scratch", stage_c),
    "D": ("D flush_exact 1 block keys-only", lambda: _run_exact_keys(1)),
    "E": ("E flush_exact 2 blocks keys-only", lambda: _run_exact_keys(2)),
}


def main():
    print(f"device: {jax.devices()[0].platform}", flush=True)
    which = sys.argv[1:] or list(STAGES)
    for w in which:
        name, fn = STAGES[w]
        stage(name, fn)



def stage_a72():
    """72-row (multiple-of-8) DMA variant of stage A."""
    E = 8

    def kern(s_ref, x_ref, o_ref, sc, sem):
        off = s_ref[0]
        sc[0:S] = x_ref[...]
        sc[S:S + E] = jnp.broadcast_to(x_ref[0:1], (E, 128))
        cp = pltpu.make_async_copy(sc, o_ref.at[pl.ds(off, S + E), :], sem)
        cp.start()
        cp.wait()

    x = jnp.arange(S * 128, dtype=jnp.int32).reshape(S, 128)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((S + 16, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((S + E, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )(jnp.asarray([3], jnp.int32), x)
    got = np.asarray(out)
    return (np.array_equal(got[3:3 + S], np.asarray(x))
            and np.array_equal(got[3 + S], np.asarray(x)[0]))


def stage_a_split():
    """Split DMA variant: 64-row tile + separate 1-row spill at dyn offset."""
    def kern(s_ref, x_ref, o_ref, sc, c1, sem):
        off = s_ref[0]
        sc[...] = x_ref[...]
        c1[...] = x_ref[0:1]
        cp = pltpu.make_async_copy(sc, o_ref.at[pl.ds(off, S), :], sem.at[0])
        cp.start()
        cp2 = pltpu.make_async_copy(
            c1, o_ref.at[pl.ds(off + S, 1), :], sem.at[1]
        )
        cp2.start()
        cp.wait()
        cp2.wait()

    x = jnp.arange(S * 128, dtype=jnp.int32).reshape(S, 128)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((S + 9, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((S, 128), jnp.int32),
                        pltpu.VMEM((1, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(jnp.asarray([3], jnp.int32), x)
    got = np.asarray(out)
    return (np.array_equal(got[3:3 + S], np.asarray(x))
            and np.array_equal(got[3 + S], np.asarray(x)[0]))


STAGES["A72"] = ("A72 72-row dyn-offset DMA", stage_a72)
STAGES["ASPLIT"] = ("ASPLIT 64+1 split DMA", stage_a_split)


if __name__ == "__main__":
    main()
