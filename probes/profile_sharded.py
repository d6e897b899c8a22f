"""Multi-device scaling SHAPE on the virtual CPU mesh.

Only one real TPU chip is reachable in this environment, so real multi-chip
throughput cannot be measured.  What CAN be measured is the scaling *shape*
of voxelize_sharded on an 8-virtual-device CPU mesh: per-round host planning
cost, dispatch count, and how per-device work divides as devices are added.
Combined with the single-chip pass/merge timings (probes/profile_pass.py,
probes/profile_merge.py) this yields the projected real-silicon scaling model
documented in BASELINE.md.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python probes/profile_sharded.py [n_tris] [resolution]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from bench import make_sphere_mesh
from obj2voxel_tpu.engine import TriangleSoup
from obj2voxel_tpu.ops.plan import plan_mesh
from obj2voxel_tpu.parallel.mesh import voxelize_sharded


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    soup = TriangleSoup.from_vertices(make_sphere_mesh(n_tris))

    base = None
    for nd in (1, 2, 4, 8):
        # warm (compiles per device count -- shard_map programs are per-mesh)
        voxelize_sharded(soup, resolution=res, n_devices=nd,
                         pair_tile=1 << 16)
        t0 = time.perf_counter()
        xyz, _ = voxelize_sharded(soup, resolution=res, n_devices=nd,
                                  pair_tile=1 << 16)
        dt = time.perf_counter() - t0
        if base is None:
            base = dt
        print(f"devices={nd}  wall={dt * 1e3:7.1f} ms  "
              f"speedup={base / dt:4.2f}x  voxels={xyz.shape[0]}",
              flush=True)

    # host planning cost per device round (serial on the host today)
    verts = soup.verts
    from obj2voxel_tpu.geometry import compute_mesh_transform, mesh_bounds
    from obj2voxel_tpu.ops.subdivide import subdivide_soup

    mn, mx = mesh_bounds(verts)
    tr = compute_mesh_transform(mn, mx, res)
    v = tr.apply(verts)
    v, _, _ = subdivide_soup(v, soup.uvs)
    clamp = np.array([res, res, res], np.float32)
    vmin = np.clip(np.floor(v.min(axis=1)), 0, clamp).astype(np.int32)
    vmax = np.clip(np.floor(v.max(axis=1)) + 1, 0, clamp).astype(np.int32)
    t0 = time.perf_counter()
    for d in range(8):
        z0, z1 = d * res // 8, (d + 1) * res // 8
        plan_mesh(vmin, vmax, res, res, slot_budget=1 << 18, z_window=(z0, z1))
    print(f"host planning, 8 windows: {(time.perf_counter() - t0) * 1e3:.1f} ms "
          f"({v.shape[0]} subdivided tris)", flush=True)


if __name__ == "__main__":
    main()
