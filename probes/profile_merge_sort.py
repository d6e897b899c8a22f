"""Device probe: merge-sort strategies at merge sizes (2^22 / 2^23 rows).

The slab merge's initial 5-operand stable sort is the dominant merge stage
(~33.6 ms per 2^23 rows).  Candidates:

  A. 5-op sort (key + 4 channels)                     -- current
  B. 2-op sort (key, iota) + 4-channel gather by idx  -- less sort traffic,
     adds one random gather pass
  C. 2-op sort + gather of a (P, 4) row-major matrix  -- one gather of 16 B
     rows instead of 4 strided gathers

Chains reps with a data dependency; relay sync ~33 ms subtracted once.

Usage: python probes/profile_merge_sort.py [log2_rows]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=6):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0][:1]).astype(jnp.float32))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    s = sum(jnp.sum(jax.tree.leaves(o)[0][:1]).astype(jnp.float32) for o in outs)
    float(s)
    return (time.perf_counter() - t0 - 0.033) / reps * 1e3


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 23
    P = 1 << lg
    rng = np.random.RandomState(0)
    keys = jnp.asarray(rng.randint(0, 1 << 28, P).astype(np.int32))
    chans = [jnp.asarray(rng.rand(P).astype(np.float32)) for _ in range(4)]
    mat = jnp.stack(chans, axis=-1)  # (P, 4)

    @jax.jit
    def sort5(k, c0, c1, c2, c3):
        return jax.lax.sort((k, c0, c1, c2, c3), num_keys=1, is_stable=True)

    @jax.jit
    def sort2_gather(k, c0, c1, c2, c3):
        idx = jax.lax.iota(jnp.int32, k.shape[0])
        sk, si = jax.lax.sort((k, idx), num_keys=1, is_stable=False)
        return (sk,) + tuple(jnp.take(c, si, axis=0) for c in (c0, c1, c2, c3))

    @jax.jit
    def sort2_gather_mat(k, m):
        idx = jax.lax.iota(jnp.int32, k.shape[0])
        sk, si = jax.lax.sort((k, idx), num_keys=1, is_stable=False)
        return sk, jnp.take(m, si, axis=0)

    @jax.jit
    def sort2_only(k):
        idx = jax.lax.iota(jnp.int32, k.shape[0])
        return jax.lax.sort((k, idx), num_keys=1, is_stable=False)

    @jax.jit
    def gather_only(si, m):
        return jnp.take(m, si, axis=0)

    t5 = timeit(sort5, keys, *chans)
    t2g = timeit(sort2_gather, keys, *chans)
    t2gm = timeit(sort2_gather_mat, keys, mat)
    t2 = timeit(sort2_only, keys)
    si = jax.block_until_ready(sort2_only(keys))[1]
    tg = timeit(gather_only, si, mat)

    print(f"rows 2^{lg} (ms):")
    print(f"  A 5-op stable sort:          {t5:8.2f}")
    print(f"  B 2-op sort + 4 gathers:     {t2g:8.2f}")
    print(f"  C 2-op sort + (P,4) gather:  {t2gm:8.2f}")
    print(f"    2-op sort alone:           {t2:8.2f}")
    print(f"    (P,4) gather alone:        {tg:8.2f}")


if __name__ == "__main__":
    main()
