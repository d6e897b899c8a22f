"""Minimal on-device check of pack_exact_pallas (first Mosaic run)."""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from obj2voxel_tpu.ops.pack_pallas import (
    BLOCK, pack_exact_pallas, pack_exact_ref, _INV,
)


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    P = 1 << lg
    assert P % BLOCK == 0
    rng = np.random.RandomState(0)
    keys = rng.randint(0, 1 << 28, P).astype(np.int32)
    keys[rng.rand(P) > 0.37] = _INV
    vals = tuple(rng.rand(P).astype(np.float32) for _ in range(4))
    vals = tuple(np.where(keys == _INV, 0.0, v).astype(np.float32) for v in vals)

    print(f"device: {jax.devices()[0].platform}", flush=True)
    k, vs, cnt = pack_exact_pallas(
        jnp.asarray(keys), tuple(jnp.asarray(v) for v in vals)
    )
    cnt = int(cnt)
    rk, rvs, rcnt = pack_exact_ref(keys, vals)
    print(f"count {cnt} vs ref {rcnt}", flush=True)
    assert cnt == rcnt
    ok = np.array_equal(np.asarray(k)[:cnt], rk[:cnt])
    print(f"keys exact: {ok}")
    for a, b in zip(vs, rvs):
        assert np.array_equal(np.asarray(a)[:cnt], b[:cnt])
    print("ALL PASS")


if __name__ == "__main__":
    main()
