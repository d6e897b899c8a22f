"""Config-4 host-memory accounting: per-stage RSS deltas, no device needed.

Replays the HOST portion of Instance.voxelize for the 10M-tri @ 2048^3 scale
config (scripts/scale_proof.py config4) and prints the RSS delta after every
stage, attributing the ~6.3 GB peak the scale proof records.  The device-side
stream adds only the JAX client (~0.4 GB) on top: device buffers live behind
the relay, not in host RSS.

Usage: python probes/profile_memory.py [n_tris] [resolution]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    page = os.sysconf("SC_PAGE_SIZE")
    with open("/proc/self/statm") as s:
        return int(s.read().split()[1]) * page / 1e9


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    from bench import make_sphere_mesh
    from obj2voxel_tpu.engine import (
        MAX_PASS_BUDGET,
        TriangleSoup,
        _pad_tris,
        _pow2_at_least,
        build_tri_table,
    )

    # O2V_PROBE_PREPAD=1 replays the pre-round-3 _pad_tris path (pads the five
    # source arrays before packing) for comparison; the default measures the
    # SHIPPED path (engine.voxelize_grid packs with n_pad in place).
    prepad = os.environ.get("O2V_PROBE_PREPAD") == "1"
    from obj2voxel_tpu.geometry import compute_mesh_transform, mesh_bounds
    from obj2voxel_tpu.ops.plan import plan_mesh
    from obj2voxel_tpu.ops.subdivide import subdivide_soup

    stages = []
    last = rss_gb()

    def mark(name):
        nonlocal last
        cur = rss_gb()
        stages.append((name, cur - last, cur))
        last = cur

    t0 = time.perf_counter()
    tris = make_sphere_mesh(n_target)
    soup = TriangleSoup.from_vertices(tris)
    del tris
    mark(f"mesh gen + soup ({len(soup)} tris)")

    mesh_min, mesh_max = mesh_bounds(soup.verts)
    transform = compute_mesh_transform(mesh_min, mesh_max, res, None)
    verts_host = transform.apply(soup.verts)
    mark("transform (voxel-space copy)")

    verts_host, uvs_host, tri_index = subdivide_soup(verts_host, soup.uvs)
    types_host = soup.types[tri_index]
    rgb_host = soup.rgb[tri_index]
    tex_host = soup.tex[tri_index]
    n_sub = verts_host.shape[0]
    soup = None
    mark(f"subdivide ({n_sub} tris) + input soup freed")

    clamp_hi = np.array([res, res, res], np.float32)
    vmin_h = np.clip(np.floor(verts_host.min(axis=1)), 0, clamp_hi).astype(np.int32)
    vmax_h = np.clip(np.floor(verts_host.max(axis=1)) + 1, 0, clamp_hi).astype(np.int32)
    mark("int32 AABBs")

    n_pad = _pow2_at_least(n_sub)
    if prepad:
        verts, uvs, types, rgb, tex = _pad_tris(
            [verts_host, uvs_host, types_host, rgb_host, tex_host], n_pad
        )
        mark(f"pad to {n_pad} (legacy _pad_tris path)")
        table = build_tri_table(verts, uvs, types, rgb, tex)
        del verts, uvs, types, rgb, tex
        del verts_host, uvs_host, types_host, rgb_host, tex_host
        mark(f"tri table ({table.nbytes / 1e9:.2f} GB) + padded copies freed")
    else:
        # the shipped path: pack with n_pad in place (engine.voxelize_grid)
        table = build_tri_table(
            verts_host, uvs_host, types_host, rgb_host, tex_host, n_pad=n_pad
        )
        del verts_host, uvs_host, types_host, rgb_host, tex_host
        mark(f"tri table ({table.nbytes / 1e9:.2f} GB, n_pad={n_pad}) "
             "+ host copies freed")

    order, segments = plan_mesh(
        vmin_h, vmax_h, res, res, slot_budget=4 * MAX_PASS_BUDGET
    )
    mark(f"host plan ({order.size} rows, {len(segments)} segments)")

    import resource

    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"\n{'stage':48s} {'+GB':>7s} {'RSS GB':>8s}")
    for name, d, cur in stages:
        print(f"{name:48s} {d:+7.2f} {cur:8.2f}")
    print(f"\npeak ru_maxrss: {peak:.2f} GB   wall: {time.perf_counter() - t0:.0f}s")


if __name__ == "__main__":
    main()
