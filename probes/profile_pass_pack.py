"""Device probe: fused-pass kernel cost split — pack=True vs pack=False.

Chains `reps` kernel invocations with a data dependency (rows perturbed by
the previous output's first element) so per-op device time is exposed
despite the ~33 ms relay pull floor.

Usage: python probes/profile_pass_pack.py [log2_budget] [expand]
"""
import os, sys, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    expand = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    budget = 1 << lg
    reps = 8

    from obj2voxel_tpu.engine import build_tri_table
    from obj2voxel_tpu.ops.pass_fused import fused_pass_pallas

    res = 256
    R = budget // expand
    rng = np.random.RandomState(0)
    n = R
    span = 1.2 if expand <= 8 else 6.0
    verts = rng.uniform(1, res - 1 - span, size=(n, 3, 3)).astype(np.float32)
    verts[:, 1:, :] = verts[:, :1, :] + rng.uniform(
        -span, span, size=(n, 2, 3)).astype(np.float32)
    uvs = rng.rand(n, 3, 2).astype(np.float32)
    types = np.full(n, 1, np.int32)
    rgb = rng.rand(n, 3).astype(np.float32)
    tex = np.full(n, -1, np.int32)
    tableT = jnp.asarray(
        np.ascontiguousarray(build_tri_table(verts, uvs, types, rgb, tex).T)
    )[:, :R]

    def chain(pack, reps):
        @jax.jit
        def f(rows):
            acc = jnp.float32(0)
            for _ in range(reps):
                out = fused_pass_pallas(
                    rows, jnp.int32(0), jnp.int32(0), jnp.int32(res),
                    jnp.int32(res), jnp.int32(R),
                    expand=expand, budget=budget, pack=pack,
                )
                w = out[1]
                acc = acc + jnp.sum(w[:128])
                rows = rows + (acc - acc)  # data dep, numerically zero
            return acc
        return f

    for pack in (False, True):
        f1, fn = chain(pack, 1), chain(pack, reps)
        # warm
        float(f1(tableT)); float(fn(tableT))
        t1s, tns = [], []
        for _ in range(5):
            t0 = time.perf_counter(); float(f1(tableT)); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(fn(tableT)); tns.append(time.perf_counter() - t0)
        t1 = sorted(t1s)[2]; tn = sorted(tns)[2]
        per = (tn - t1) / (reps - 1)
        print(f"pack={pack}: chain1 {t1*1e3:.2f} ms  chain{reps} {tn*1e3:.2f} ms"
              f"  -> {per*1e3:.2f} ms/op")


if __name__ == "__main__":
    main()
