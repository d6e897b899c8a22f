"""Per-stage device timing of one bucket pass at 2^21 slots.

Times each jitted sub-stage of engine._bucket_pass in isolation on the TPU:
expansion+rank-decode, Pallas clip, premultiply+key, multi-operand sort,
streaming segment-combine kernel, compaction sort.  The relay link adds
~33 ms per sync; each stage is timed over REPS dispatches between two syncs
so the per-call relay cost amortizes.

Usage: python probes/profile_pass.py [log2_slots]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    # sync via tiny pull
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1]).astype(jnp.float32))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    s = sum(jnp.sum(jax.tree.leaves(o)[0][..., :1]).astype(jnp.float32) for o in outs)
    float(s)
    dt = (time.perf_counter() - t0 - 0.033) / reps
    return dt * 1e3


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    B = 1 << lg
    K = 8  # expand factor (2^3-slot buckets)
    R = B // K
    rng = np.random.RandomState(0)

    from obj2voxel_tpu.engine import build_tri_table
    from obj2voxel_tpu.ops.clip_pallas import clip_pairs_pallas
    from obj2voxel_tpu.ops.combine import (
        combine_sorted,
        _combine_sorted_kernel,
        premultiply,
        sort_channels,
    )

    res = 1024
    verts = rng.uniform(1, res - 2, size=(R, 3, 3)).astype(np.float32)
    verts[:, 1:, :] = verts[:, :1, :] + rng.uniform(-1.6, 1.6, size=(R, 2, 3)).astype(np.float32)
    uvs = np.zeros((R, 3, 2), np.float32)
    types = np.full(R, 1, np.int32)
    rgbc = np.ones((R, 3), np.float32)
    tex = np.full(R, -1, np.int32)
    tableT = jnp.asarray(np.ascontiguousarray(build_tri_table(verts, uvs, types, rgbc, tex).T))

    @jax.jit
    def expand(tT):
        rows = tT[:, :R]
        e = jnp.broadcast_to(rows[:, :, None], (24, R, K)).reshape(24, B)
        rank = jnp.arange(B, dtype=jnp.int32) & (K - 1)
        vx0 = jnp.floor(e[0:3].min(0)).astype(jnp.int32)
        vx = vx0 + (rank % 2)
        return e[:16], jnp.stack([vx, vx, vx, jnp.zeros_like(vx)]).astype(jnp.float32)

    tri16, vox = jax.block_until_ready(expand(tableT))
    print(f"expand+decode      {timeit(expand, tableT):7.2f} ms / 2^{lg}")

    clip = jax.jit(lambda t, v: clip_pairs_pallas(t, v))
    wuv = jax.block_until_ready(clip(tri16, vox))
    print(f"pallas clip        {timeit(clip, tri16, vox):7.2f} ms")

    w = np.abs(rng.randn(B)).astype(np.float32)
    rgb = rng.rand(B, 3).astype(np.float32)
    keys = rng.randint(0, 1 << 28, size=B).astype(np.int32)
    keys_d, w_d, rgb_d = jnp.asarray(keys), jnp.asarray(w), jnp.asarray(rgb)

    prem = jax.jit(premultiply)
    chans = jax.block_until_ready(prem(w_d, rgb_d))
    print(f"premultiply        {timeit(prem, w_d, rgb_d):7.2f} ms")

    srt = jax.jit(sort_channels)
    sk, sch = jax.block_until_ready(srt(keys_d, chans))
    print(f"sort_channels      {timeit(srt, keys_d, chans):7.2f} ms")

    comb = jax.jit(lambda k, v: combine_sorted(k, v, jnp.bool_(True)))
    print(f"combine (scan)     {timeit(comb, sk, sch):7.2f} ms")

    combk = jax.jit(lambda k, v: _combine_sorted_kernel(k, v, jnp.bool_(True)))
    print(f"combine (pallas)   {timeit(combk, sk, sch):7.2f} ms")

    sort1 = jax.jit(lambda k, v: jax.lax.sort((k,) + tuple(v), num_keys=1, is_stable=False))
    print(f"bare 5-op sort     {timeit(sort1, sk, sch):7.2f} ms")


if __name__ == "__main__":
    main()
