"""Device probe: cost of the plan-order table gather (engine._gather_sorted).

The gather `table[order].T` is dispatched at the end of plan+gather and
EXECUTES inside the wave window (async dispatch), so its cost hides in the
wave's drain+pull time.  At the 2M-tri bench the order is padded to 2^22
rows: the gather moves ~400 MB and the transpose relays it again.

Times, at m_pad = 2^22, N = 2^21 table rows:
  A. table[order].T      (current: row gather + transpose)
  B. table[order]        (row gather alone)
  C. transpose alone     (of a materialized (M, 24))
  D. gather with order clipped to live prefix size (2^21., how much of A
     is the dead-tail padding)

Usage: python probes/profile_gather.py [log2_mpad]
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
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        jax.block_until_ready(o)
    # block_until_ready is unreliable on the relay; pull one element
    float(jnp.sum(jax.tree.leaves(outs[-1])[0].ravel()[:1]).astype(jnp.float32))
    return (time.perf_counter() - t0 - 0.033) / reps * 1e3


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    M = 1 << lg
    N = 1 << 21
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.rand(N, 24).astype(np.float32))
    order_np = np.zeros(M, np.int32)
    live = int(0.48 * M)
    order_np[:live] = rng.randint(0, N, live)
    order = jnp.asarray(order_np)
    order_live = jnp.asarray(order_np[:live // 1024 * 1024])

    ga = jax.jit(lambda t, o: t[o].T)
    gb = jax.jit(lambda t, o: t[o])
    mat = jax.block_until_ready(gb(table, order))
    gc = jax.jit(lambda m: m.T)

    t_a = timeit(ga, table, order)
    t_b = timeit(gb, table, order)
    t_c = timeit(gc, mat)
    t_d = timeit(ga, table, order_live)

    print(f"m_pad 2^{lg}, live {live} (ms):")
    print(f"  A gather+transpose (current): {t_a:8.2f}")
    print(f"  B gather alone:               {t_b:8.2f}")
    print(f"  C transpose alone:            {t_c:8.2f}")
    print(f"  D gather+T, live-only order:  {t_d:8.2f}")


if __name__ == "__main__":
    main()
