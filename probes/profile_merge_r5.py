"""Round-5 merge-strategy A/B on the real chip (2M @ 1024^3 blend, e2e).

Configs (env combos, same process, same device mesh):
  A0 stable    : round-4 path — in-kernel pack + STABLE 5-op merge sort
  A1 unstable  : pack + unstable merge sort (BLEND sums are order-free;
                 XLA's stable sort pays an implicit tie-break channel)
  B  compact   : O2V_PACK=0 — sort-based pass compaction (round-3 style),
                 unstable merge sort
  C  mergeruns : O2V_PACK=0 + O2V_MERGE_RUNS=1 — sort-based pass compaction
                 feeding the merge-path Pallas kernel (ops/merge_pallas.py),
                 which replaces the merge's bitonic sort entirely

Context: the round-4 default pass tail packs in SLOT order, so the
merge-path kernel cannot see sorted runs under it; C pays the per-pass
compaction sort to buy sorted runs.  This probe records which trade wins
end-to-end (VERDICT.md round-5 item 2: "or a committed probe proving why
not").

Usage: python probes/profile_merge_r5.py [ntris] [resolution]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_sphere_mesh  # noqa: E402


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    resolution = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    import jax.numpy as jnp

    from obj2voxel_tpu.constants import ANTI_BLEED, TRI_MATERIALLESS
    from obj2voxel_tpu.engine import (
        MAX_PASS_BUDGET,
        _pow2_at_least,
        build_tri_table,
        stream_slabs,
    )
    from obj2voxel_tpu.ops.color import TexturePool

    tris = make_sphere_mesh(n_target)
    n = tris.shape[0]
    scale = (resolution - ANTI_BLEED) / 2.0
    tris = (tris + 1.0) * np.float32(scale) + np.float32(ANTI_BLEED / 2.0)
    n_pad = _pow2_at_least(n)
    verts = np.zeros((n_pad, 3, 3), np.float32)
    verts[:n] = tris
    pixels_np, meta_np = TexturePool().device_arrays()
    table = jnp.asarray(
        build_tri_table(
            verts,
            np.zeros((n_pad, 3, 2), np.float32),
            np.full((n_pad,), TRI_MATERIALLESS, np.int32),
            np.ones((n_pad, 3), np.float32),
            np.full((n_pad,), -1, np.int32),
        )
    )
    table.block_until_ready()
    vmin = np.clip(np.floor(tris.min(axis=1)), 0, resolution).astype(np.int64)
    vmax = np.clip(np.floor(tris.max(axis=1)) + 1, 0, resolution).astype(
        np.int64
    )
    pixels = jnp.asarray(pixels_np)
    meta = jnp.asarray(meta_np)

    def run():
        voxels = 0
        checks = []
        for xyz, argb, count in stream_slabs(
            table, pixels, meta,
            aabb_host=(vmin, vmax),
            stride=resolution, z_extent=resolution,
            is_blend=True, do_down=False,
            pair_tile=MAX_PASS_BUDGET,
            device_outputs=True,
        ):
            voxels += count
            checks.append(
                jnp.sum(argb, dtype=jnp.uint32)
                ^ jnp.sum(xyz.astype(jnp.uint32))
            )
        if checks:
            float(np.asarray(sum(checks) & jnp.uint32(0xFFFF)))
        return voxels

    configs = [
        ("A0 pack+stable-sort", {"O2V_MERGE_STABLE": "1"}),
        ("A1 pack+unstable-sort", {}),
        ("B  compact+unstable-sort", {"O2V_PACK": "0"}),
        ("C  compact+merge-runs", {"O2V_PACK": "0", "O2V_MERGE_RUNS": "1"}),
    ]
    results = {}
    base_vox = None
    for name, env in configs:
        for k in ("O2V_MERGE_STABLE", "O2V_PACK", "O2V_MERGE_RUNS"):
            os.environ.pop(k, None)
        os.environ.update(env)
        t0 = time.perf_counter()
        vox = run()  # warm / compile
        warm = time.perf_counter() - t0
        if base_vox is None:
            base_vox = vox
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            v = run()
            times.append(time.perf_counter() - t0)
            assert v == vox, (name, v, vox)
        med = sorted(times)[1]
        results[name] = med
        print(
            f"{name:28s} median {med:6.3f}s  (runs {['%.3f' % t for t in times]},"
            f" first(+compile) {warm:.1f}s, voxels {vox}"
            f"{' == A0' if vox == base_vox else ' != A0 <-- CHECK'})",
            flush=True,
        )
    best = min(results, key=results.get)
    print(f"winner: {best}  ({results[best]:.3f}s)")


if __name__ == "__main__":
    main()
