"""Device probe: where does plan stage1+pull (~63 ms at 2M tris) go?

Components, each timed with a dependent pull minus the ~33 ms relay sync:
  A. full _stage1 + per_row pull        -- what the engine pays
  B. AABB min/max alone (vmin pull row)
  C. the z-histogram scatter-add alone (2M random adds into 1024 bins)
  D. sort-free segment-sum histogram (sorted-z assumption does NOT hold;
     measured for reference only)

Usage: python probes/profile_plan_stage1.py [log2_tris]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from obj2voxel_tpu.engine import build_tri_table
from obj2voxel_tpu.ops.plan_device import _stage1


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0][:1]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args)
        float(jnp.sum(jax.tree.leaves(o)[0][:1]).astype(jnp.float32))
    return (time.perf_counter() - t0) / reps * 1e3 - 33.0


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    n = 1 << lg
    res = 1024
    rng = np.random.RandomState(0)
    span = 3.0
    verts = rng.uniform(1, res - 1 - span, size=(n, 3, 3)).astype(np.float32)
    verts[:, 1:, :] = verts[:, :1, :] + rng.uniform(
        -span, span, size=(n, 2, 3)
    ).astype(np.float32)
    uvs = np.zeros((n, 3, 2), np.float32)
    types = np.full(n, 1, np.int32)
    rgb = rng.rand(n, 3).astype(np.float32)
    tex = np.full(n, -1, np.int32)
    table = jnp.asarray(build_tri_table(verts, uvs, types, rgb, tex))
    jax.block_until_ready(table)

    def full(t):
        per_row, vmin, vmax = _stage1(
            t, jnp.int32(n), stride=res, z_extent=res
        )
        return np.asarray(per_row)

    @jax.jit
    def aabb_only(t):
        v = t[:, 0:9].reshape(-1, 3, 3)
        hi = jnp.array([res, res, res], jnp.float32)
        vmin = jnp.clip(jnp.floor(jnp.min(v, axis=1)), 0.0, hi)
        vmax = jnp.clip(jnp.floor(jnp.max(v, axis=1)) + 1.0, 0.0, hi)
        return vmin.astype(jnp.int32), vmax.astype(jnp.int32)

    vmin, vmax = jax.block_until_ready(aabb_only(table))

    @jax.jit
    def hist_only(vmin, vmax):
        sx = (vmax[:, 0] - vmin[:, 0]).astype(jnp.float32)
        sy = (vmax[:, 1] - vmin[:, 1]).astype(jnp.float32)
        area = sx * sy
        diff = jnp.zeros(res + 1, jnp.float32)
        diff = diff.at[vmin[:, 2]].add(area).at[vmax[:, 2]].add(-area)
        return jnp.cumsum(diff[:-1])

    tA = timeit(full, table)
    tB = timeit(lambda t: np.asarray(aabb_only(t)[0][:8]), table)
    tC = timeit(lambda a, b: np.asarray(hist_only(a, b)), vmin, vmax)

    print(f"n=2^{lg} tris, res={res} (ms, relay sync subtracted):")
    print(f"  A full stage1 + per_row pull: {tA:8.2f}")
    print(f"  B AABB alone (+tiny pull):    {tB:8.2f}")
    print(f"  C z-hist scatter-add (+pull): {tC:8.2f}")


if __name__ == "__main__":
    main()
