"""Device probe: gather cost model — rows vs bytes.

probe_gather_sorted.py showed the plan-order table gather costs ~200 ms for
2^22 rows x 24 f32 regardless of transpose fusion.  Is that row-latency
bound (fix: gather fewer, wider rows — e.g. plan in groups of 8 triangles so
the gather moves (8, 24)-tiles) or byte bound (fix: narrower rows)?

Times a gather of L live sorted-run indices (plus a zero tail to M) from an
(N, W) f32 table, for W in {12, 24, 48, 96, 192} with N scaled so the live
BYTES are constant (W * N = const), and separately a fixed-N width sweep.

Usage: python probes/probe_gather_width.py
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


def sorted_run_order(m_pad, n, live, rng, slabs=4, mean_expand=8):
    parts = []
    per = live // slabs
    for _ in range(slabs):
        rows = np.sort(rng.randint(0, n, per // mean_expand))
        parts.append(np.repeat(rows, mean_expand)[:per])
    order = np.zeros(m_pad, np.int32)
    cat = np.concatenate(parts)
    order[: cat.size] = cat
    return jnp.asarray(order)


def main():
    rng = np.random.RandomState(0)
    g = jax.jit(lambda t, o: t[o])

    # constant live logical data: W * L = 24 * 2^21 elements
    print("constant live bytes (rows shrink as width grows):")
    for w in (12, 24, 48, 96, 192):
        live = (24 * (1 << 21)) // w
        m_pad = 1 << int(np.ceil(np.log2(live * 2)))
        n = live  # table as large as the live set
        table = jnp.asarray(rng.rand(n, w).astype(np.float32))
        order = sorted_run_order(m_pad, n, live, rng)
        t = timeit(g, table, order)
        print(
            f"  W={w:4d}: rows {live:8d} (pad {m_pad:8d})  {t:8.2f} ms"
            f"  ({live / t * 1e-3:7.1f} Mrow/s, "
            f"{live * w * 4 / t * 1e-6:7.2f} GB/s)",
            flush=True,
        )

    # fixed rows, growing width
    print("fixed 2^20 live rows:")
    live = 1 << 20
    m_pad = 1 << 21
    for w in (12, 24, 48, 96):
        table = jnp.asarray(rng.rand(live, w).astype(np.float32))
        order = sorted_run_order(m_pad, live, live, rng)
        t = timeit(g, table, order)
        print(
            f"  W={w:4d}: {t:8.2f} ms ({live / t * 1e-3:7.1f} Mrow/s, "
            f"{live * w * 4 / t * 1e-6:7.2f} GB/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
