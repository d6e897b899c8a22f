"""Isolate the cost of pair expansion vs rank decode at 2^21 slots.

Variants measured on the TPU:
  bcast+reshape  -- current expand_rows (broadcast (C,R,1)->(C,R,K) -> reshape)
  repeat         -- jnp.repeat along the pair axis
  take           -- gather rows[iota >> k]
  einsum-onehot  -- (C,S,G) @ (G,128) one-hot expansion on the MXU
  decode-intdiv  -- the %/// rank decode on pre-expanded channels
  decode-float   -- float-reciprocal decode with one correction step
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=20):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1]).astype(jnp.float32))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    s = sum(jnp.sum(jax.tree.leaves(o)[0][..., :1]).astype(jnp.float32) for o in outs)
    float(s)
    return (time.perf_counter() - t0 - 0.033) / reps * 1e3


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    B = 1 << lg
    K = 8
    R = B // K
    C = 24
    rng = np.random.RandomState(0)
    rows = jnp.asarray(rng.rand(C, R).astype(np.float32))

    @jax.jit
    def bcast(x):
        return jnp.broadcast_to(x[:, :, None], (C, R, K)).reshape(C, B)

    @jax.jit
    def rep(x):
        return jnp.repeat(x, K, axis=1)

    @jax.jit
    def take(x):
        idx = jnp.arange(B, dtype=jnp.int32) >> 3
        return x[:, idx]

    G = 128 // K
    S = B // 128
    E = jnp.asarray((np.arange(128) // K == np.arange(G)[:, None]).astype(np.float32))

    @jax.jit
    def onehot(x):
        x3 = x.reshape(C, S, G)
        return jnp.einsum(
            "csg,gl->csl", x3, E, precision=jax.lax.Precision.HIGHEST
        ).reshape(C, B)

    print(f"bcast+reshape   {timeit(bcast, rows):7.2f} ms  ({C}ch, K={K})")
    print(f"repeat          {timeit(rep, rows):7.2f} ms")
    print(f"take            {timeit(take, rows):7.2f} ms")
    print(f"einsum-onehot   {timeit(onehot, rows):7.2f} ms")
    ref = np.asarray(bcast(rows))
    for name, fn in (("repeat", rep), ("take", take), ("onehot", onehot)):
        got = np.asarray(fn(rows))
        print(f"  {name} exact: {np.array_equal(got, ref)}")

    # decode variants on (B,) channels
    sx = rng.randint(1, 64, size=B).astype(np.int32)
    sy = rng.randint(1, 64, size=B).astype(np.int32)
    local = rng.randint(0, 1 << 18, size=B).astype(np.int32)
    sxd, syd, locd = jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(local)

    @jax.jit
    def dec_int(local, sx, sy):
        vx = local % sx
        rest = local // sx
        vy = rest % sy
        vz = rest // sy
        return vx, vy, vz

    @jax.jit
    def dec_float(local, sx, sy):
        lf = local.astype(jnp.float32)
        sxf = sx.astype(jnp.float32)
        syf = sy.astype(jnp.float32)
        q = jnp.floor(lf * (1.0 / sxf))
        r = lf - q * sxf
        q = jnp.where(r < 0, q - 1.0, jnp.where(r >= sxf, q + 1.0, q))
        vx = lf - q * sxf
        q2 = jnp.floor(q * (1.0 / syf))
        r2 = q - q2 * syf
        q2 = jnp.where(r2 < 0, q2 - 1.0, jnp.where(r2 >= syf, q2 + 1.0, q2))
        vy = q - q2 * syf
        return vx.astype(jnp.int32), vy.astype(jnp.int32), q2.astype(jnp.int32)

    print(f"decode-intdiv   {timeit(dec_int, locd, sxd, syd):7.2f} ms")
    print(f"decode-float    {timeit(dec_float, locd, sxd, syd):7.2f} ms")
    a = jax.tree.map(np.asarray, dec_int(locd, sxd, syd))
    b = jax.tree.map(np.asarray, dec_float(locd, sxd, syd))
    print(f"  decode exact: {all(np.array_equal(x, y) for x, y in zip(a, b))}")


if __name__ == "__main__":
    main()
