"""Benchmark: voxelization throughput on the real device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference claims up to ~10 M voxels/s on high-end CPU hardware
(reference README.adoc:266-270); BASELINE.json's headline metric is
Mtriangles/s at 1024^3 (blend).  vs_baseline reports voxel throughput
relative to the 10 Mvox/s reference claim.

The mesh is benchmarked device-resident with outputs MATERIALIZED ON DEVICE
(xyz+argb arrays; per-slab counts and a checksum cross the link): this
container reaches its TPU through a ~15 MB/s relay tunnel whose host<->device
transfer cost is an environment artifact -- a real TPU host moves data over
PCIe at GB/s, while the relay alone would cap ANY engine at ~1 Mvox/s -- so
including the tunnel would measure the relay, not the engine.  Modes:
  device (default): outputs on device, counts+checksum pulled.
  pull:             outputs pulled to host through the relay.
  host:             full host path including mesh transform + upload.
"""

import json
import sys
import time

import numpy as np


def make_sphere_mesh(n_tris: int) -> np.ndarray:
    """Procedural UV-sphere triangle soup with ~n_tris triangles (unit radius)."""
    n_lat = max(8, int(np.sqrt(n_tris / 2)))
    n_lon = max(8, n_tris // (2 * n_lat))
    lat = np.linspace(0, np.pi, n_lat + 1)
    lon = np.linspace(0, 2 * np.pi, n_lon + 1)
    theta, phi = np.meshgrid(lat, lon, indexing="ij")
    pts = np.stack(
        [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)],
        axis=-1,
    ).astype(np.float32)
    a = pts[:-1, :-1]
    b = pts[1:, :-1]
    c = pts[1:, 1:]
    d = pts[:-1, 1:]
    t1 = np.stack([a, b, c], axis=2).reshape(-1, 3, 3)
    t2 = np.stack([a, c, d], axis=2).reshape(-1, 3, 3)
    return np.concatenate([t1, t2]).astype(np.float32)


def run_device_resident(n_target: int, resolution: int, pull: bool = False):
    import jax.numpy as jnp

    from obj2voxel_tpu.constants import ANTI_BLEED, TRI_MATERIALLESS
    from obj2voxel_tpu.engine import (
        MAX_PASS_BUDGET,
        _pow2_at_least,
        build_tri_table,
        stream_slabs,
    )
    from obj2voxel_tpu.ops.color import TexturePool

    # host-generate once (cheap), scale into voxel space like the engine's
    # transform would, then park everything on device
    tris = make_sphere_mesh(n_target)
    n = tris.shape[0]
    scale = (resolution - ANTI_BLEED) / 2.0
    tris = (tris + 1.0) * np.float32(scale) + np.float32(ANTI_BLEED / 2.0)

    n_pad = _pow2_at_least(n)
    verts = np.zeros((n_pad, 3, 3), np.float32)
    verts[:n] = tris
    uvs = np.zeros((n_pad, 3, 2), np.float32)
    types = np.full((n_pad,), TRI_MATERIALLESS, np.int32)
    rgb = np.ones((n_pad, 3), np.float32)
    tex = np.full((n_pad,), -1, np.int32)
    pixels_np, meta_np = TexturePool().device_arrays()

    table = jnp.asarray(build_tri_table(verts, uvs, types, rgb, tex))
    table.block_until_ready()

    vmin = np.clip(np.floor(tris.min(axis=1)), 0, resolution).astype(np.int64)
    vmax = np.clip(np.floor(tris.max(axis=1)) + 1, 0, resolution).astype(np.int64)

    def run():
        voxels = 0
        checks = []
        for out in stream_slabs(
            table,
            jnp.asarray(pixels_np),
            jnp.asarray(meta_np),
            aabb_host=(vmin, vmax),
            stride=resolution,
            z_extent=resolution,
            is_blend=True,
            do_down=False,
            pair_tile=MAX_PASS_BUDGET,  # O2V_MAX_PASS_BUDGET raises both caps
            device_outputs=not pull,
        ):
            if pull:
                xyz, argb = out
                voxels += xyz.shape[0]
            else:
                xyz, argb, count = out
                voxels += count
                # touch every output byte on device (proves materialization)
                checks.append(jnp.sum(argb, dtype=jnp.uint32) ^ jnp.sum(
                    xyz.astype(jnp.uint32)))
        if checks:
            float(np.asarray(sum(checks) & jnp.uint32(0xFFFF)))
        return voxels

    voxels = run()  # warmup / compile; runs are deterministic, so the voxel
    # count is captured here once (the timed pull=True runs still transfer the
    # voxels -- that transfer IS what pull mode measures -- but the reported
    # count no longer pairs the median time with an arbitrary run's output)
    # median of 3 timed runs: run-to-run variance through the relay tunnel is
    # ~10%, so a single sample can misreport a regression or an improvement
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        assert run() == voxels
        times.append(time.perf_counter() - t0)
    elapsed = sorted(times)[1]
    return n, voxels, elapsed


def run_host(n_target: int, resolution: int):
    from obj2voxel_tpu.constants import BLEND_STRATEGY
    from obj2voxel_tpu.engine import TriangleSoup, voxelize_soup

    soup = TriangleSoup.from_vertices(make_sphere_mesh(n_target))
    for _ in voxelize_soup(soup, resolution=resolution, strategy=BLEND_STRATEGY):
        pass
    t0 = time.perf_counter()
    voxels = 0
    for xyz, _ in voxelize_soup(soup, resolution=resolution, strategy=BLEND_STRATEGY):
        voxels += xyz.shape[0]
    return len(soup), voxels, time.perf_counter() - t0


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    resolution = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    mode = sys.argv[3] if len(sys.argv) > 3 else "device"

    if mode == "host":
        n, voxels, elapsed = run_host(n_target, resolution)
    else:
        n, voxels, elapsed = run_device_resident(
            n_target, resolution, pull=(mode == "pull")
        )

    mtris = n / elapsed / 1e6
    mvox = voxels / elapsed / 1e6
    print(
        json.dumps(
            {
                "metric": (
                    f"Mtriangles/s @ {resolution}^3 blend "
                    f"({n} tris, {voxels} voxels, {elapsed:.3f}s, {mode}-resident)"
                ),
                "value": round(mtris, 3),
                "unit": "Mtri/s",
                "vs_baseline": round(mvox / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
