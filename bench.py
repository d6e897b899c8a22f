"""Benchmark: end-to-end voxelization throughput on the real device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference claims up to ~10 M voxels/s on high-end CPU hardware
(reference README.adoc:266-270); BASELINE.json's headline metric is
Mtriangles/s at 1024^3 (blend).  We report Mtriangles/s on a procedurally
generated high-triangle-count mesh and compare voxel throughput against the
10 Mvox/s reference claim as vs_baseline.
"""

import json
import sys
import time

import numpy as np


def make_sphere_mesh(n_tris: int) -> np.ndarray:
    """Procedural UV-sphere-ish triangle soup with ~n_tris triangles."""
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


def main():
    from obj2voxel_tpu.constants import BLEND_STRATEGY
    from obj2voxel_tpu.engine import TriangleSoup, voxelize_soup

    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    resolution = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    tris = make_sphere_mesh(n_target)
    soup = TriangleSoup.from_vertices(tris)
    n = len(soup)

    # warmup (compile): full configuration so the timed run hits only cached
    # executables
    for _ in voxelize_soup(soup, resolution=resolution, strategy=BLEND_STRATEGY):
        pass

    t0 = time.perf_counter()
    voxels = 0
    for xyz, argb in voxelize_soup(soup, resolution=resolution, strategy=BLEND_STRATEGY):
        voxels += xyz.shape[0]
    elapsed = time.perf_counter() - t0

    mtris = n / elapsed / 1e6
    mvox = voxels / elapsed / 1e6
    # vs_baseline: reference CPU claim is ~10 Mvoxels/s (README.adoc:268)
    print(
        json.dumps(
            {
                "metric": f"Mtriangles/s @ {resolution}^3 blend ({n} tris, {voxels} voxels, {elapsed:.2f}s)",
                "value": round(mtris, 3),
                "unit": "Mtri/s",
                "vs_baseline": round(mvox / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
