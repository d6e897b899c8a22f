"""Multi-chip scaling shape: analytic pass/round/balance model (host-only).

Only ONE real TPU chip is reachable from this container, so real-silicon
multi-chip throughput cannot be measured.  This probe derives what the
sharded path's wall decomposes into WITHOUT running any device code — every
quantity below is computed by the host planner, so it runs in seconds:

  - per-device pass counts for D in {1, 2, 4, 8} device windows,
  - lockstep round counts (the sharded engine dispatches one (expand,
    budget) class at a time across all devices; a round costs the max over
    devices, so imbalance is the efficiency loss),
  - balance = ideal rounds / actual rounds,
  - host planning cost for all D windows.

Combined with the single-chip per-pass and per-merge device timings
(probes/profile_pass.py, probes/profile_merge.py) this parameterizes the
projected scaling model in BASELINE.md:

  T(D) ~ plan(D) + rounds(D) * t_pass + t_merge/D + t_out/D

`voxelize_sharded` itself is timed on the virtual mesh by
probes/profile_sharded.py (CPU warm timings — shape only, not throughput).

Run: python probes/profile_multichip.py [ntris] [resolution]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import make_sphere_mesh  # noqa: E402

from obj2voxel_tpu.engine import (  # noqa: E402
    MAX_PASS_BUDGET,
    TriangleSoup,
    _schedule_passes,
)
from obj2voxel_tpu.ops.plan import plan_mesh  # noqa: E402
from obj2voxel_tpu.parallel.mesh import _device_windows  # noqa: E402


def pass_stats(vmin, vmax, sample_res, n_devices, max_budget):
    """Per-device pass counts and lockstep round counts for one mesh."""
    windows, win_h = _device_windows(sample_res, n_devices)
    per_dev_passes = []
    per_dev_sched = []
    t0 = time.perf_counter()
    for w0, w1 in windows:
        order_d, segs_d = plan_mesh(
            vmin, vmax, sample_res, sample_res,
            slot_budget=4 * max_budget, z_window=(w0, w1),
        )
        if order_d is None:
            per_dev_passes.append(0)
            per_dev_sched.append({})
            continue
        sched = {}
        for expand, budget, r0, n_rows, local_base, wide in _schedule_passes(
            segs_d, max_budget
        ):
            sched.setdefault((expand, budget, wide), 0)
            sched[(expand, budget, wide)] += 1
        per_dev_passes.append(sum(sched.values()))
        per_dev_sched.append(sched)
    plan_s = time.perf_counter() - t0
    classes = sorted({c for sched in per_dev_sched for c in sched})
    rounds = sum(
        max(sched.get(c, 0) for sched in per_dev_sched) for c in classes
    )
    return per_dev_passes, rounds, len(classes), plan_s


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    resolution = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    tris = make_sphere_mesh(n_target)
    soup = TriangleSoup.from_vertices(tris)
    n = len(soup)
    print(f"mesh: {n} tris @ {resolution}^3, budget 2^21 (analytic, host-only)")

    # host-side AABBs for the pass-count analysis (mesh transform identical to
    # voxelize_sharded's: unit cube -> voxel space)
    from obj2voxel_tpu.geometry import compute_mesh_transform, mesh_bounds
    from obj2voxel_tpu.ops.subdivide import subdivide_soup

    mn, mx = mesh_bounds(soup.verts)
    tr = compute_mesh_transform(mn, mx, resolution, None)
    verts = tr.apply(soup.verts)
    verts, _, _ = subdivide_soup(verts, soup.uvs)
    vmin = np.clip(np.floor(verts.min(axis=1)), 0, resolution).astype(np.int64)
    vmax = np.clip(np.floor(verts.max(axis=1)) + 1, 0, resolution).astype(np.int64)

    print(f"{'D':>2} {'passes/dev':>28} {'rounds':>6} {'ideal':>6} "
          f"{'balance':>8} {'plan_s':>7}")
    for d in (1, 2, 4, 8):
        per_dev, rounds, n_classes, plan_s = pass_stats(
            vmin, vmax, resolution, d, MAX_PASS_BUDGET
        )
        total_passes = sum(per_dev)
        ideal = total_passes / d
        balance = ideal / rounds if rounds else 1.0
        print(f"{d:>2} {str(per_dev):>28} {rounds:>6} {ideal:>6.1f} "
              f"{balance:>8.2f} {plan_s:>7.3f}")


if __name__ == "__main__":
    main()
