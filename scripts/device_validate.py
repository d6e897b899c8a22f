"""On-device (Mosaic) kernel validation against the jnp oracles.

The pytest suite runs the Pallas kernels in interpret mode on CPU; a Mosaic
regression would therefore surface as wrong voxels in a benchmark, not a red
test (VERDICT r2 weak #4).  This script runs the three kernels on the REAL
device and compares against the jnp oracle computed on the same device:

  1. clip_pairs_pallas        vs ops/clip.clip_channels
  2. segment_combine_pallas   vs ops/combine.combine_sorted
  3. fused_pass_pallas        vs engine._bucket_pass's XLA pipeline
     (also proves the in-kernel one-hot MXU expansion selects exactly:
     any inexactness shifts voxel coordinates and flips keys)
  4. pack_channels_pallas     vs its NumPy oracle, and the fused pack=True
     multi-pass path vs the sort-compacted path through a downstream merge
     (round 4: in-kernel prefix compaction replaces the compaction sort)

Integer outputs (keys, coords, counts, MAX selections) must match exactly;
float weights are compared to a few ulps (XLA fuses mul+add chains
differently per program shape, so cross-program bit equality is not defined
even between two correct implementations).

Usage: python scripts/device_validate.py            (~1 min warm-cache)
The committed log lives at probes/device_validate_r3.log.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

FAILURES = []


def check(name, ok, detail=""):
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {name} {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def validate_clip():
    from obj2voxel_tpu.ops.clip import clip_channels
    from obj2voxel_tpu.ops.clip_pallas import clip_pairs_pallas

    rng = np.random.RandomState(0)
    P = 1 << 16
    tri = np.empty((16, P), np.float32)
    tri[0:9] = rng.uniform(0, 64, size=(9, P))
    # mix in small triangles clustered around their voxel
    small = rng.rand(P) < 0.7
    base = rng.uniform(1, 62, size=(3, P.__index__())).astype(np.float32)
    for v in range(3):
        for a in range(3):
            tri[3 * v + a, small] = (
                base[a, small] + rng.uniform(-1, 1, small.sum()).astype(np.float32)
            )
    tri[9:15] = rng.rand(6, P).astype(np.float32)
    tri[15] = 0
    vox = np.empty((4, P), np.float32)
    vox[0:3] = np.floor(tri[0:3] + rng.uniform(-1, 1, size=(3, P)))
    vox[3] = 0

    tri_d, vox_d = jnp.asarray(tri), jnp.asarray(vox)
    out_k = np.asarray(clip_pairs_pallas(tri_d, vox_d))
    w_o, u_o, v_o = (np.asarray(x)[0] for x in clip_channels(tri_d, vox_d))

    occ_k = out_k[0] > 0
    occ_o = w_o > 0
    check("clip occupancy", np.array_equal(occ_k, occ_o),
          f"({int(occ_o.sum())} occupied of {P})")
    ok_w = np.allclose(out_k[0], w_o, rtol=5e-6, atol=1e-6)
    ok_uv = np.allclose(out_k[1][occ_o], u_o[occ_o], rtol=5e-5, atol=1e-5) and \
            np.allclose(out_k[2][occ_o], v_o[occ_o], rtol=5e-5, atol=1e-5)
    check("clip weights", ok_w,
          f"(max dw {np.abs(out_k[0] - w_o).max():.2e})")
    check("clip uvs", ok_uv)


def validate_combine():
    from obj2voxel_tpu.ops.combine import (
        INVALID_KEY, combine_sorted, premultiply, sort_channels,
        _combine_sorted_kernel,
    )

    rng = np.random.RandomState(1)
    P = 1 << 16
    for is_blend in (False, True):
        keys = rng.randint(0, 5000, P).astype(np.int32)
        w = (rng.rand(P) + 0.01).astype(np.float32)
        w[rng.rand(P) < 0.2] = 0.0
        keys = np.where(w > 0, keys, int(INVALID_KEY)).astype(np.int32)
        rgb = rng.rand(P, 3).astype(np.float32)

        chans = premultiply(jnp.asarray(w), jnp.asarray(rgb))
        sk, sch = sort_channels(jnp.asarray(keys), chans)
        ok_, och, oc = combine_sorted(sk, sch, jnp.bool_(is_blend))
        kk, kch, kc = _combine_sorted_kernel(sk, sch, jnp.bool_(is_blend))

        oc, kc = int(oc), int(kc)
        name = f"combine[{'blend' if is_blend else 'max'}]"
        check(f"{name} count", oc == kc, f"({oc})")
        keys_eq = np.array_equal(np.asarray(ok_)[:oc], np.asarray(kk)[:kc])
        check(f"{name} keys", keys_eq)
        ov = np.stack([np.asarray(c)[:oc] for c in och], -1)
        kv = np.stack([np.asarray(c)[:kc] for c in kch], -1)
        if is_blend:
            vals_ok = np.allclose(ov, kv, rtol=2e-6, atol=1e-7)
        else:
            vals_ok = np.array_equal(ov, kv)  # MAX selection is bit-exact
        check(f"{name} values", vals_ok)


def validate_fused():
    from obj2voxel_tpu.engine import _bucket_pass, build_tri_table, pass_scalars

    BUDGET = 1 << 17
    pixels = jnp.zeros(1, jnp.uint32)
    meta = jnp.zeros((1, 4), jnp.int32)
    res = 256
    for expand in (1, 8, 64, 512, 16384):
        span = min(0.5 * expand ** (1 / 3) + 0.5, 12.0)
        R = BUDGET // expand
        rng = np.random.RandomState(expand)
        n = R + 8
        verts = rng.uniform(1, res - 1 - span, size=(n, 3, 3)).astype(np.float32)
        verts[:, 1:, :] = verts[:, :1, :] + rng.uniform(
            -span, span, size=(n, 2, 3)
        ).astype(np.float32)
        uvs = rng.rand(n, 3, 2).astype(np.float32)
        types = np.full(n, 1, np.int32)
        rgb = rng.rand(n, 3).astype(np.float32)
        tex = np.full(n, -1, np.int32)
        tableT = jnp.asarray(
            np.ascontiguousarray(build_tri_table(verts, uvs, types, rgb, tex).T)
        )

        outs = []
        for fused in (False, True):
            keys, chans, xyz, argb, count = _bucket_pass(
                tableT, pixels, meta,
                pass_scalars(0, max(R - 1, 1), 0, 0, res, res, False, False),
                expand=expand, budget=BUDGET,
                use_pallas=True, fused=fused,
            )
            c = int(count)
            outs.append((
                np.asarray(keys[:c]),
                np.stack([np.asarray(ch[:c]) for ch in chans], -1),
                c,
            ))
        (k0, v0, c0), (k1, v1, c1) = outs
        name = f"fused[expand={expand}]"
        check(f"{name} count", c0 == c1, f"({c0})")
        check(f"{name} keys", np.array_equal(k0, k1))
        check(f"{name} values", np.allclose(v0, v1, rtol=5e-6, atol=1e-6),
              f"(max dv {np.abs(v0 - v1).max() if c0 == c1 and c0 else 0:.2e})")


def validate_pack():
    from obj2voxel_tpu.engine import _bucket_pass, build_tri_table, pass_scalars
    from obj2voxel_tpu.ops.combine import merge_combined
    from obj2voxel_tpu.ops.pack_pallas import (
        pack_channels_pallas, pack_channels_ref, _INV,
    )

    # 4a. standalone pack kernel vs the NumPy oracle
    rng = np.random.RandomState(3)
    P = 1 << 18
    keys = rng.randint(0, 1 << 28, P).astype(np.int32)
    keys[rng.rand(P) > 0.25] = _INV
    chans_np = [rng.rand(P).astype(np.float32) for _ in range(4)]
    chans_np = [np.where(keys == _INV, 0.0, c).astype(np.float32)
                for c in chans_np]
    pk, pch, cnt = pack_channels_pallas(
        jnp.asarray(keys), tuple(jnp.asarray(c) for c in chans_np)
    )
    rk, rch, rcnt = pack_channels_ref(keys, chans_np)
    cnt = int(cnt)
    check("pack count", cnt == rcnt, f"({cnt})")
    check("pack keys", np.array_equal(np.asarray(pk)[:cnt], rk[:cnt]))
    check("pack values", all(
        np.array_equal(np.asarray(a)[:cnt], b[:cnt])
        for a, b in zip(pch, rch)
    ))

    # 4b. fused multi-pass path: pack=True (O2V_PACK default) vs the sort
    # compaction (O2V_PACK=0), each fed through the slab merge -- the engine
    # contract the pack kernel must uphold (order-preserving compaction makes
    # the merge's stable sort see the same stream either way)
    BUDGET = 1 << 17
    expand = 64
    res = 256
    R = BUDGET // expand
    rng = np.random.RandomState(7)
    n = R + 8
    span = 2.5
    verts = rng.uniform(1, res - 1 - span, size=(n, 3, 3)).astype(np.float32)
    verts[:, 1:, :] = verts[:, :1, :] + rng.uniform(
        -span, span, size=(n, 2, 3)
    ).astype(np.float32)
    uvs = rng.rand(n, 3, 2).astype(np.float32)
    types = np.full(n, 1, np.int32)
    rgb = rng.rand(n, 3).astype(np.float32)
    tex = np.full(n, -1, np.int32)
    tableT = jnp.asarray(
        np.ascontiguousarray(build_tri_table(verts, uvs, types, rgb, tex).T)
    )
    outs = []
    for pack_on in ("1", "0"):
        os.environ["O2V_PACK"] = pack_on
        # O2V_PACK is read at TRACE time and is not part of the jit cache
        # key; drop the memoized trace so each setting compiles its own
        # program (the persistent compile cache keys on HLO, so this only
        # re-traces)
        _bucket_pass.clear_cache()
        try:
            keys, chans, _, _, count = _bucket_pass(
                tableT, jnp.zeros(1, jnp.uint32), jnp.zeros((1, 4), jnp.int32),
                pass_scalars(0, R - 1, 0, 0, res, res, True, False),
                expand=expand, budget=BUDGET,
                use_pallas=True, finalize=False, fused=True,
            )
        finally:
            del os.environ["O2V_PACK"]
        mk, mch, mc = merge_combined(keys, chans, jnp.bool_(True))
        mc = int(mc)
        outs.append((np.asarray(mk)[:mc],
                     np.stack([np.asarray(c)[:mc] for c in mch], -1), mc))
    (k1, v1, c1), (k0, v0, c0) = outs
    check("pack-vs-sort merge count", c0 == c1, f"({c1})")
    check("pack-vs-sort merge keys", np.array_equal(k0, k1))
    check("pack-vs-sort merge values", np.array_equal(v0, v1),
          "(bit-exact: identical per-key operand streams)")


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})", flush=True)
    if dev.platform == "cpu":
        print("WARNING: running on CPU -- this validates interpret-mode only")
    t0 = time.perf_counter()
    validate_clip()
    validate_combine()
    validate_fused()
    validate_pack()
    print(f"total {time.perf_counter() - t0:.1f} s; "
          f"{'ALL PASS' if not FAILURES else f'FAILURES: {FAILURES}'}")
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
