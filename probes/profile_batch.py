"""Per-stage device timing of the BATCHED pass at 2^21 slots.

The round-3 batched dispatch (engine._bucket_pass_batch) runs nbatch fused
passes in one pallas_call + one batched compaction sort, yet the end-to-end
wave time stayed ~22 ms/pass (bench O2V_TIMING).  This probe decomposes a
batched pass on the real chip:

  1. fused kernel alone, nbatch in {1, 8}
  2. batched 5-operand compaction sort, (8, 2^21) vs (2^21,)
  3. row assembly prologue (per-pass slice concat)
  4. _bucket_pass_batch end-to-end vs 8x single _bucket_pass

Relay sync costs ~33 ms; every row times REPS dispatches between two syncs.

Usage: python probes/profile_batch.py [log2_slots] [expand]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=10):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1]).astype(jnp.float32))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    s = sum(jnp.sum(jax.tree.leaves(o)[0][..., :1]).astype(jnp.float32) for o in outs)
    float(s)
    dt = (time.perf_counter() - t0 - 0.033) / reps
    return dt * 1e3


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    expand = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    budget = 1 << lg
    B = 8
    R = budget // expand
    rng = np.random.RandomState(0)
    res = 1024

    from obj2voxel_tpu.engine import (
        _bucket_pass, _bucket_pass_batch, build_tri_table, pass_scalars)
    from obj2voxel_tpu.ops.combine import sort_channels
    from obj2voxel_tpu.ops.pass_fused import fused_pass_batch_pallas

    n = B * R + 32
    verts = rng.uniform(1, res - 3, size=(n, 3, 3)).astype(np.float32)
    verts[:, 1:, :] = verts[:, :1, :] + rng.uniform(-1.6, 1.6, size=(n, 2, 3)).astype(np.float32)
    uvs = np.zeros((n, 3, 2), np.float32)
    types = np.full(n, 1, np.int32)
    rgbc = np.ones((n, 3), np.float32)
    tex = np.full(n, -1, np.int32)
    tableT = jnp.asarray(np.ascontiguousarray(build_tri_table(verts, uvs, types, rgbc, tex).T))
    tableT.block_until_ready()

    pixels = jnp.zeros(1, jnp.uint32)
    meta = jnp.zeros((1, 4), jnp.int32)
    r0s = jnp.asarray(np.arange(B, dtype=np.int32) * R)
    n_rows = jnp.asarray(np.full(B, R, np.int32))
    zeros = jnp.asarray(np.zeros(B, np.int32))
    z_los = zeros
    z_his = jnp.asarray(np.full(B, res, np.int32))

    # --- row assembly prologue (what _bucket_pass_batch does before the
    # kernel), isolated.  Round 3.1: the AABB/aug runs in-kernel, so this is
    # just a lane-axis concat of the per-pass slices.
    @jax.jit
    def assemble(tT):
        return jnp.concatenate(
            [jax.lax.dynamic_slice(tT, (0, r0s[i]), (24, R)) for i in range(B)],
            axis=1,
        )

    rows24 = jax.block_until_ready(assemble(tableT))
    t_asm = timeit(assemble, tableT)

    # --- fused kernel alone at nbatch=1 and nbatch=8
    # scal columns: (local_base, z_lo, stride, z_hi, n_rows)
    scal1 = (
        jnp.zeros((1, 5), jnp.int32).at[:, 2].set(res)
        .at[:, 3].set(res).at[:, 4].set(R)
    )
    scal8 = (
        jnp.zeros((B, 5), jnp.int32).at[:, 2].set(res)
        .at[:, 3].set(res).at[:, 4].set(R)
    )
    d1 = rows24[:, :R]

    def k1(d):
        return fused_pass_batch_pallas(d, scal1, expand=expand, budget=budget, nbatch=1)

    def k8(d):
        return fused_pass_batch_pallas(d, scal8, expand=expand, budget=budget, nbatch=B)

    t_k1 = timeit(k1, d1)
    t_k8 = timeit(k8, rows24)

    # --- compaction sort at (2^21,) and (8, 2^21)
    key1, w1, a1, b1, c1 = jax.block_until_ready(k1(d1))
    key8, w8, a8, b8, c8 = jax.block_until_ready(k8(rows24))

    def s1(k, ch0, ch1, ch2, ch3):
        return sort_channels(k.reshape(budget), (ch0.reshape(budget), ch1.reshape(budget), ch2.reshape(budget), ch3.reshape(budget)))

    def s8(k, ch0, ch1, ch2, ch3):
        return sort_channels(k, (ch0, ch1, ch2, ch3))

    s1j = jax.jit(s1)
    s8j = jax.jit(s8)
    t_s1 = timeit(s1j, key1, w1, a1, b1, c1)
    t_s8 = timeit(s8j, key8, w8, a8, b8, c8)

    # --- end-to-end comparisons
    def bb():
        return _bucket_pass_batch(
            tableT, r0s, n_rows, zeros, z_los, z_his, jnp.int32(res),
            expand=expand, budget=budget, nbatch=B, use_pallas=True,
        )

    def bs():
        outs = []
        for i in range(B):
            outs.append(_bucket_pass(
                tableT, pixels, meta,
                pass_scalars(int(r0s[i]), R, 0, 0, res, res, True, False),
                expand=expand, budget=budget, use_pallas=True,
                finalize=False,
            ))
        return outs

    t_bb = timeit(bb, reps=5)
    t_bs = timeit(bs, reps=5)

    print(f"budget 2^{lg}, expand {expand}, nbatch {B} (times in ms)")
    print(f"  row assembly (slice concat):             {t_asm:8.2f}")
    print(f"  fused kernel nbatch=1:                   {t_k1:8.2f}")
    print(f"  fused kernel nbatch=8:                   {t_k8:8.2f}  ({t_k8/B:.2f}/pass)")
    print(f"  compaction sort (2^21,):                 {t_s1:8.2f}")
    print(f"  compaction sort (8, 2^21):               {t_s8:8.2f}  ({t_s8/B:.2f}/pass)")
    print(f"  _bucket_pass_batch end-to-end (8):       {t_bb:8.2f}  ({t_bb/B:.2f}/pass)")
    print(f"  8x single _bucket_pass end-to-end:       {t_bs:8.2f}  ({t_bs/B:.2f}/pass)")


if __name__ == "__main__":
    main()
