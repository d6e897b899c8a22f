"""Per-stage device timing of a slab merge (engine._merge_pass) at merge sizes.

Round-2 measured merges at ~100 ms per ~4.3M rows where the equivalent
sort+combine of the same volume costs ~45 ms; this probe isolates where the
extra time lives: the concat of many pow2-sliced pass outputs, the 5-operand
sort, the streaming combine kernel, the compaction sort, and the finalize
(key decode + ARGB pack).  Suspect of interest: (P, 4) value arrays put the
4-wide channel axis in the LANE dimension (4/128 occupancy) -- channel-major
(4, P) variants are timed side by side.

Usage: python probes/profile_merge.py [log2_rows]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1]).astype(jnp.float32))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    s = sum(jnp.sum(jax.tree.leaves(o)[0][..., :1]).astype(jnp.float32) for o in outs)
    float(s)
    dt = (time.perf_counter() - t0 - 0.033) / reps
    return dt * 1e3


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    P = 1 << lg
    rng = np.random.RandomState(0)

    from obj2voxel_tpu.ops.combine import (
        INVALID_KEY,
        finalize_colors,
        pack_argb,
    )

    def sort_vals4(keys, vals):
        # the round-2 (P, 4) layout, kept here for comparison
        sk, v0, v1, v2, v3 = jax.lax.sort(
            (keys, vals[:, 0], vals[:, 1], vals[:, 2], vals[:, 3]),
            num_keys=1, is_stable=True,
        )
        return sk, jnp.stack([v0, v1, v2, v3], axis=-1)
    from obj2voxel_tpu.ops.combine_pallas import segment_combine_pallas

    stride = 1024
    # realistic merge input: ~25% duplicate keys across chunks, pre-sorted
    # within each chunk (pass outputs arrive compacted+sorted)
    keys = rng.randint(0, stride * stride * 256, size=P).astype(np.int32)
    w = np.abs(rng.randn(P)).astype(np.float32)
    vals = np.concatenate([w[:, None], w[:, None] * rng.rand(P, 3).astype(np.float32)], axis=1)

    # split into 8 chunks of varying pow2 sizes, each sorted (like pass outputs)
    sizes = [P // 8] * 8
    ks, vs = [], []
    off = 0
    for s in sizes:
        k = np.sort(keys[off:off + s])
        ks.append(jnp.asarray(k))
        vs.append(jnp.asarray(vals[off:off + s]))
        off += s
    keys_d = jnp.asarray(keys)
    vals_d = jnp.asarray(vals)

    print(f"--- merge profile at 2^{lg} rows ---")

    concat = jax.jit(lambda *a: (jnp.concatenate(a[:8]), jnp.concatenate(a[8:], axis=0)))
    print(f"concat 8 chunks (P,4)   {timeit(concat, *ks, *vs):7.2f} ms")

    vs_t = [jnp.asarray(np.ascontiguousarray(np.asarray(v).T)) for v in vs]
    concat_t = jax.jit(lambda *a: (jnp.concatenate(a[:8]), jnp.concatenate(a[8:], axis=1)))
    print(f"concat 8 chunks (4,P)   {timeit(concat_t, *ks, *vs_t):7.2f} ms")

    srt = jax.jit(sort_vals4)
    sk, sv = jax.block_until_ready(srt(keys_d, vals_d))
    print(f"sort_vals4              {timeit(srt, keys_d, vals_d):7.2f} ms")

    # 5-op sort with channels kept separate (no (P,4) stack at the end)
    srt5 = jax.jit(lambda k, v: jax.lax.sort(
        (k, v[:, 0], v[:, 1], v[:, 2], v[:, 3]), num_keys=1, is_stable=True))
    print(f"5-op sort (no stack)    {timeit(srt5, keys_d, vals_d):7.2f} ms")

    chans = jax.block_until_ready(srt5(keys_d, vals_d))
    srt5c = jax.jit(lambda k, a, b, c, d: jax.lax.sort(
        (k, a, b, c, d), num_keys=1, is_stable=True))
    print(f"5-op sort (chans in)    {timeit(srt5c, *chans):7.2f} ms")

    combk = jax.jit(lambda k, a, b, c, d: segment_combine_pallas(
        k, a, b, c, d, jnp.bool_(True)))
    tails = jax.block_until_ready(combk(*chans))
    print(f"segment_combine_pallas  {timeit(combk, *chans):7.2f} ms")

    csort = jax.jit(lambda k, a, b, c, d: jax.lax.sort(
        (k, a, b, c, d), num_keys=1, is_stable=False))
    print(f"compaction sort         {timeit(csort, *tails):7.2f} ms")

    def fin(k, v):
        x = k % stride
        y = (k // stride) % stride
        z = k // (stride * stride)
        xyz = jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
        return xyz, pack_argb(finalize_colors(tuple(v[:, i] for i in range(4))))
    finj = jax.jit(fin)
    print(f"finalize (P,4)          {timeit(finj, sk, sv):7.2f} ms")

    def fin_c(k, w, r, g, b):
        x = k % stride
        y = (k // stride) % stride
        z = k // (stride * stride)
        safe = jnp.where(w > 0, w, 1.0)
        out = []
        for c in (r, g, b):
            q = c / safe
            q = q + (c - q * safe) / safe
            out.append(jnp.clip(jnp.round(q * 255.0), 0, 255).astype(jnp.uint32))
        argb = jnp.uint32(0xFF000000) | (out[0] << 16) | (out[1] << 8) | out[2]
        return x, y, z, argb
    finc = jax.jit(fin_c)
    print(f"finalize channel-major  {timeit(finc, *tails):7.2f} ms")

    # whole merge as currently composed (channel-major)
    from obj2voxel_tpu.engine import _merge_pass
    chans_d = tuple(vals_d[:, i] for i in range(4))
    mp = lambda k, *c: _merge_pass(
        k, c, jnp.int32(0), jnp.bool_(True),
        stride=stride, do_downscale=False, budget=P, use_kernel=True)
    jax.block_until_ready(mp(keys_d, *chans_d)[0])
    print(f"_merge_pass (e2e)       {timeit(mp, keys_d, *chans_d):7.2f} ms")


if __name__ == "__main__":
    main()
