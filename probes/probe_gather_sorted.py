"""Device probe: _gather_sorted variants with a REALISTIC plan order.

profile_gather.py used uniformly random indices and found the jitted fused
`table[order].T` catastrophically slow (70.8 s at 2^22 random rows vs
342 ms gather + 25 ms transpose unfused): XLA fuses the transpose INTO the
gather, degrading it to ~24x single-f32 random accesses per row.  The
engine's order is (slab x bucket)-sorted — ascending runs per segment with
cross-slab repeats and a zero dead tail — so this probe times that shape:

  A. jit(table[order].T)                      -- current _gather_sorted
  B. jit(table[order]) then jit(m.T)          -- two dispatches
  C. jit with optimization_barrier between    -- one dispatch, two fusions
  D. jit((table.T)[:, order])                 -- pre-transposed, lane gather

Usage: python probes/probe_gather_sorted.py [log2_mpad]
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
    float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]).astype(jnp.float32))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    s = sum(
        jnp.sum(jax.tree.leaves(o)[0].ravel()[:1]).astype(jnp.float32)
        for o in outs
    )
    float(s)
    return (time.perf_counter() - t0 - 0.033) / reps * 1e3


def realistic_order(m_pad, n, rng, slabs=4, mean_expand=8):
    """Ascending runs of repeated indices per slab, zero dead tail."""
    live_per_slab = int(0.48 * m_pad) // slabs
    parts = []
    for _ in range(slabs):
        rows = np.sort(rng.randint(0, n, live_per_slab // mean_expand))
        parts.append(np.repeat(rows, mean_expand)[:live_per_slab])
    order = np.zeros(m_pad, np.int32)
    live = np.concatenate(parts)
    order[: live.size] = live
    return order


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    M = 1 << lg
    N = 1 << 21
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.rand(N, 24).astype(np.float32))
    order = jnp.asarray(realistic_order(M, N, rng))

    ga = jax.jit(lambda t, o: t[o].T)

    gb1 = jax.jit(lambda t, o: t[o])
    gb2 = jax.jit(lambda m: m.T)

    def b(t, o):
        return gb2(gb1(t, o))

    @jax.jit
    def gc(t, o):
        m = t[o]
        (m,) = jax.lax.optimization_barrier((m,))
        return m.T

    gd_pre = jax.jit(lambda t: t.T.copy())
    tT = jax.block_until_ready(gd_pre(table))
    gd = jax.jit(lambda tt, o: tt[:, o])

    t_a = timeit(ga, table, order)
    t_b = timeit(b, table, order)
    t_c = timeit(gc, table, order)
    t_d = timeit(gd, tT, order)

    print(f"m_pad 2^{lg}, sorted-run order (ms):")
    print(f"  A fused gather+T (current):   {t_a:8.2f}")
    print(f"  B two jits (gather; T):       {t_b:8.2f}")
    print(f"  C opt-barrier split:          {t_c:8.2f}")
    print(f"  D pre-transposed lane gather: {t_d:8.2f}")


if __name__ == "__main__":
    main()
