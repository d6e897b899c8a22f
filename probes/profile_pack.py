"""Device probe: pack kernel vs compaction sort at pass sizes.

Usage: python probes/profile_pack.py [log2_size]
"""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10):
    out = fn(*args)
    # pull a scalar to force completion (block_until_ready unreliable on relay)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf.reshape(-1)[0]))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf.reshape(-1)[0]))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    P = 1 << k
    from obj2voxel_tpu.ops.pack_pallas import pack_channels_pallas, pack_channels_ref, _INV
    from obj2voxel_tpu.ops.combine import compact_channels

    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 28, P).astype(np.int32)
    keys[rng.random(P) > 0.25] = _INV
    chans = tuple(jnp.asarray(rng.standard_normal(P).astype(np.float32)) for _ in range(4))
    keys_d = jnp.asarray(keys)

    base = timeit(lambda: jnp.sum(chans[0]) * 1.0)  # dispatch+pull floor
    print(f"P=2^{k}  dispatch+pull floor: {base*1e3:.2f} ms")

    t_sort = timeit(lambda: jax.jit(compact_channels)(keys_d, chans))
    print(f"compact_channels (sort): {t_sort*1e3:.2f} ms  ({(t_sort-base)*1e3:.2f} net)")

    t_pack = timeit(lambda: pack_channels_pallas(keys_d, chans))
    print(f"pack_channels_pallas:    {t_pack*1e3:.2f} ms  ({(t_pack-base)*1e3:.2f} net)")

    # correctness on device
    pk, pch, cnt = pack_channels_pallas(keys_d, chans)
    rk, rch, rcnt = pack_channels_ref(keys, [np.asarray(c) for c in chans])
    cnt = int(cnt)
    assert cnt == rcnt, (cnt, rcnt)
    np.testing.assert_array_equal(np.asarray(pk)[:cnt], rk[:cnt])
    for a, b in zip(pch, rch):
        np.testing.assert_array_equal(np.asarray(a)[:cnt], b[:cnt])
    print("device pack output == oracle  (count", cnt, ")")


if __name__ == "__main__":
    main()


def chain_probe(k=21, reps=20):
    """Chain `reps` data-dependent ops in one jit to expose device time."""
    import functools
    P = 1 << k
    from obj2voxel_tpu.ops.pack_pallas import pack_channels_pallas, _INV
    from obj2voxel_tpu.ops.combine import compact_channels

    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 28, P).astype(np.int32)
    keys[rng.random(P) > 0.25] = _INV
    chans = tuple(jnp.asarray(rng.standard_normal(P).astype(np.float32)) for _ in range(4))
    keys_d = jnp.asarray(keys)

    def mk(op, r):
        @jax.jit
        def f(kk, ch):
            for _ in range(r):
                kk2, ch, _ = op(kk, ch)
                kk = jnp.where(kk2 == _INV, kk2, kk2 ^ 0)  # keep dep chain
            return kk, ch
        return f

    for name, op in (("sort", lambda kk, ch: jax.jit(compact_channels)(kk, ch)),
                     ("pack", lambda kk, ch: pack_channels_pallas(kk, ch))):
        t1 = timeit(lambda: mk(op, 1)(keys_d, chans), n=6)
        tn = timeit(lambda: mk(op, reps)(keys_d, chans), n=6)
        print(f"{name}: chain1 {t1*1e3:.2f} ms  chain{reps} {tn*1e3:.2f} ms  "
              f"-> {(tn-t1)/(reps-1)*1e3:.3f} ms/op")
