"""Round-5 dispatch sweep on the real chip (2M @ 1024^3 blend, e2e).

VERDICT round-5 item 3: G=8 grouped planning raised the pass count 34 -> 43
(small segments burning full dispatches) and the pack-mode O2V_BATCH
re-measurement was asserted but never committed.  This probe records, for
each config, the median wall and the wave dispatch counters
(engine.WAVE_STATS):

  G=4 / G=8 / G=16           -- planning-unit ladder sweep
  G=8 + O2V_BATCH=8          -- pack-mode batched same-shape dispatches

Usage: python probes/profile_dispatch_r5.py [ntris] [resolution]
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

    import obj2voxel_tpu.engine as eng
    from obj2voxel_tpu.constants import ANTI_BLEED, TRI_MATERIALLESS
    from obj2voxel_tpu.ops.color import TexturePool

    tris = make_sphere_mesh(n_target)
    n = tris.shape[0]
    scale = (resolution - ANTI_BLEED) / 2.0
    tris = (tris + 1.0) * np.float32(scale) + np.float32(ANTI_BLEED / 2.0)
    n_pad = eng._pow2_at_least(n)
    verts = np.zeros((n_pad, 3, 3), np.float32)
    verts[:n] = tris
    pixels_np, meta_np = TexturePool().device_arrays()
    table = jnp.asarray(
        eng.build_tri_table(
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
        for xyz, argb, count in eng.stream_slabs(
            table, pixels, meta,
            aabb_host=(vmin, vmax),
            stride=resolution, z_extent=resolution,
            is_blend=True, do_down=False,
            pair_tile=eng.MAX_PASS_BUDGET,
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
        ("G=8 (default)", {}),
        ("G=4", {"O2V_GROUP": "4"}),
        ("G=16", {"O2V_GROUP": "16"}),
        ("G=8 batch=8", {"O2V_BATCH": "8"}),
    ]
    base_vox = None
    for name, env in configs:
        for k in ("O2V_GROUP", "O2V_BATCH"):
            os.environ.pop(k, None)
        os.environ.update(env)
        t0 = time.perf_counter()
        vox = run()
        warm = time.perf_counter() - t0
        if base_vox is None:
            base_vox = vox
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            v = run()
            times.append(time.perf_counter() - t0)
            assert v == vox, (name, v, vox)
        stats = dict(eng.WAVE_STATS)
        print(
            f"{name:16s} median {sorted(times)[1]:6.3f}s "
            f"(runs {['%.3f' % t for t in times]}, first {warm:.1f}s) "
            f"passes={stats['passes']} dispatches={stats['dispatches']} "
            f"batched={stats['batched']} voxels={vox}"
            f"{'' if vox == base_vox else ' != base <-- CHECK'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
