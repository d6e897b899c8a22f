"""Minimal repro for the XLA:CPU compile segfault in the interpret-mode
pack=True fused pass (tests/test_pass_fused.py::test_batched_pass_matches_single).

Stages, each gated by argv[1] so a crash identifies the stage:
  a: pack_channels_pallas interpret (known good -- test_pack_pallas passes)
  b: fused_pass_pallas pack=True interpret (single pass, nbatch=1)
  c: fused_pass_batch_pallas pack=True interpret nbatch=4 (the crash site)
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from obj2voxel_tpu.engine import build_tri_table

BUDGET = 1 << 14
EXPAND = 8
R = BUDGET // EXPAND


def table(n, res=64, span=1.2, seed=1):
    rng = np.random.RandomState(seed)
    verts = rng.uniform(1, res - 1 - span, size=(n, 3, 3)).astype(np.float32)
    verts[:, 1:, :] = verts[:, :1, :] + rng.uniform(
        -span, span, size=(n, 2, 3)
    ).astype(np.float32)
    uvs = rng.uniform(0, 1, size=(n, 3, 2)).astype(np.float32)
    types = np.full(n, 1, np.int32)
    rgb = rng.rand(n, 3).astype(np.float32)
    tex = np.full(n, -1, np.int32)
    return jnp.asarray(np.ascontiguousarray(
        build_tri_table(verts, uvs, types, rgb, tex).T))


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "c"
    if stage == "a":
        from obj2voxel_tpu.ops.pack_pallas import pack_channels_pallas, _INV
        rng = np.random.RandomState(0)
        P = 8192
        keys = rng.randint(0, 100, P).astype(np.int32)
        keys[rng.rand(P) > 0.3] = _INV
        ch = tuple(jnp.asarray(rng.rand(P).astype(np.float32)) for _ in range(4))
        k, c, n = pack_channels_pallas(jnp.asarray(keys), ch, interpret=True)
        print("a ok", int(n))
    elif stage == "b":
        from obj2voxel_tpu.ops.pass_fused import fused_pass_pallas
        t = table(R + 8)
        out = fused_pass_pallas(
            t, jnp.int32(0), jnp.int32(0), jnp.int32(64), jnp.int32(64),
            jnp.int32(R - 1),
            expand=EXPAND, budget=BUDGET, interpret=True, pack=True,
        )
        print("b ok", int(out[5]))
    elif stage == "c":
        from obj2voxel_tpu.ops.pass_fused import fused_pass_batch_pallas
        B = 4
        t = table(B * R + 32)
        rows_cat = jnp.concatenate(
            [jax.lax.dynamic_slice(t, (0, i * R), (24, R)) for i in range(B)],
            axis=1,
        )
        scal = jnp.stack(
            [jnp.zeros(B, jnp.int32),                              # local_base
             jnp.asarray(np.array([0, 16, 32, 48], np.int32)),     # z_lo
             jnp.full(B, 64, jnp.int32),                           # stride
             jnp.asarray(np.array([16, 32, 48, 64], np.int32)),    # z_hi
             jnp.full(B, R, jnp.int32)],                           # n_rows
            axis=1,
        )
        out = fused_pass_batch_pallas(
            rows_cat, scal, expand=EXPAND, budget=BUDGET, nbatch=B,
            interpret=True, pack=True,
        )
        print("c ok", np.asarray(out[5]))


if __name__ == "__main__":
    main()
