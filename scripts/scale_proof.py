"""Scale proofs for BASELINE configs 4-6.

Config 4: 10M-triangle binary STL streamed through z-slabs at 2048^3 into a
          sparse VL32 file with bounded memory (reference story: 8192^3 in
          ~100 MB via chunk streaming, README.adoc:272-278).
Config 5: batched dataset generation -- 1000 small meshes voxelized in one
          device pipeline at 64^3.
Config 6: the reference's headline resolution claim -- 8192^3 through the
          real API into VL32 (reference README.adoc:272-278).  The mesh is a
          100k-triangle helix tube spanning the full grid on every axis, so
          all ~270 z-slabs carry work (and the >32-slab host-planner fallback
          is exercised) while the voxel count stays relay-transfer-friendly
          (~2-5M).  Memory must stay bounded (RSS well under the 10M-tri
          run's), proving O(active voxels per slab), not O(r^3).

Prints one JSON line per config with wall-clock and peak host RSS.
Usage: python scripts/scale_proof.py [4|5|6|all]
"""

import json
import os
import resource
import struct
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_sphere_mesh  # noqa: E402


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def start_rss_sampler(path: str, period_s: float = 0.5):
    """Sample current RSS (from /proc/self/statm) to `path` until exit.

    ru_maxrss only gives the peak; attributing the peak to a pipeline stage
    needs the timeline.  Lines are `t_rel_s current_rss_gb`; align them with
    the O2V_TIMING stage logs (same process, same clock) to build the
    config-4 memory breakdown in BASELINE.md."""
    import threading

    page = os.sysconf("SC_PAGE_SIZE")
    f = open(path, "w", buffering=1)
    t0 = time.perf_counter()

    def loop():
        while True:
            with open("/proc/self/statm") as s:
                rss = int(s.read().split()[1]) * page
            f.write(f"{time.perf_counter() - t0:.2f} {rss / 1e9:.3f}\n")
            time.sleep(period_s)

    th = threading.Thread(target=loop, daemon=True)
    th.start()
    return th


def write_stl(path: str, tris: np.ndarray):
    n = tris.shape[0]
    rec = np.zeros(n, dtype=np.dtype([("n", "<f4", 3), ("v", "<f4", (3, 3)), ("a", "<u2")]))
    rec["v"] = tris
    with open(path, "wb") as f:
        f.write(b"\x00" * 80)
        f.write(struct.pack("<I", n))
        f.write(rec.tobytes())


def config4():
    from obj2voxel_tpu.api import Instance

    n_target = 10_000_000
    res = 2048
    stl = "/tmp/o2v_scale_10m.stl"
    out = "/tmp/o2v_scale_10m.vl32"
    if not os.path.exists(stl):
        tris = make_sphere_mesh(n_target)
        write_stl(stl, tris)
        del tris

    t0 = time.perf_counter()
    inst = Instance()
    inst.set_input_file(stl, "stl")
    inst.set_output_file(out, "vl32")
    inst.set_resolution(res)
    code = inst.voxelize()
    elapsed = time.perf_counter() - t0
    voxels = os.path.getsize(out) // 16
    print(json.dumps({
        "config": 4,
        "desc": f"10M-tri STL -> {res}^3 VL32 (streamed slabs)",
        "exit": code,
        "voxels": voxels,
        "wall_s": round(elapsed, 1),
        "peak_rss_gb": round(rss_gb(), 2),
    }), flush=True)
    assert code == 0 and voxels > 0


def config5():
    from obj2voxel_tpu.engine import TriangleSoup, voxelize_batch

    rng = np.random.RandomState(0)
    soups = []
    for i in range(1000):
        n = int(rng.randint(50, 400))
        tris = make_sphere_mesh(n) * rng.uniform(0.5, 1.5)
        soups.append(TriangleSoup.from_vertices(tris))

    t0 = time.perf_counter()
    results = voxelize_batch(soups, resolution=64)
    elapsed = time.perf_counter() - t0
    total_vox = sum(r[0].shape[0] for r in results)
    nonempty = sum(1 for r in results if r[0].shape[0])
    print(json.dumps({
        "config": 5,
        "desc": "1000 small meshes batched at 64^3",
        "meshes": len(results),
        "nonempty": nonempty,
        "voxels": total_vox,
        "wall_s": round(elapsed, 1),
        "meshes_per_s": round(len(results) / elapsed, 1),
        "peak_rss_gb": round(rss_gb(), 2),
    }), flush=True)
    assert nonempty == 1000


def make_helix_mesh(n_tris: int, turns: float = 3.0, tube_r: float = 0.002):
    """Triangulated helix tube spanning [0,1]^3 with a small surface area:
    voxel count grows O(r), not O(r^2), so 8192^3 output stays pullable
    through the ~15 MB/s relay while every z-slab still carries geometry."""
    sides = 6
    n_seg = max(n_tris // (2 * sides), 8)
    t = np.linspace(0.0, 1.0, n_seg + 1)
    ang = 2 * np.pi * turns * t
    cx = 0.5 + 0.45 * np.cos(ang)
    cy = 0.5 + 0.45 * np.sin(ang)
    cz = t
    center = np.stack([cx, cy, cz], axis=1)
    # local frame: tangent x up -> two normals
    tang = np.gradient(center, axis=0)
    tang /= np.linalg.norm(tang, axis=1, keepdims=True)
    up = np.array([0.0, 0.0, 1.0])
    n1 = np.cross(tang, up)
    n1 /= np.maximum(np.linalg.norm(n1, axis=1, keepdims=True), 1e-9)
    n2 = np.cross(tang, n1)
    phi = 2 * np.pi * np.arange(sides) / sides
    ring = (
        center[:, None, :]
        + tube_r * np.cos(phi)[None, :, None] * n1[:, None, :]
        + tube_r * np.sin(phi)[None, :, None] * n2[:, None, :]
    )  # (n_seg+1, sides, 3)
    a = ring[:-1]
    b = ring[1:]
    a2 = np.roll(a, -1, axis=1)
    b2 = np.roll(b, -1, axis=1)
    tris = np.concatenate(
        [
            np.stack([a, b, a2], axis=2).reshape(-1, 3, 3),
            np.stack([a2, b, b2], axis=2).reshape(-1, 3, 3),
        ]
    ).astype(np.float32)
    return tris


def config6():
    from obj2voxel_tpu.api import Instance

    res = 8192
    out = "/tmp/o2v_scale_8192.vl32"
    tris = make_helix_mesh(100_000)
    stl = "/tmp/o2v_scale_helix.stl"
    write_stl(stl, tris)
    del tris

    t0 = time.perf_counter()
    inst = Instance()
    inst.set_input_file(stl, "stl")
    inst.set_output_file(out, "vl32")
    inst.set_resolution(res)
    code = inst.voxelize()
    elapsed = time.perf_counter() - t0
    voxels = os.path.getsize(out) // 16
    print(json.dumps({
        "config": 6,
        "desc": f"100k-tri helix -> {res}^3 VL32 (streamed slabs, host planner)",
        "exit": code,
        "voxels": voxels,
        "wall_s": round(elapsed, 1),
        "peak_rss_gb": round(rss_gb(), 2),
    }), flush=True)
    assert code == 0 and voxels > 0


if __name__ == "__main__":
    if "--trace" in sys.argv:
        sys.argv.remove("--trace")
        os.environ["O2V_TIMING"] = "1"
        start_rss_sampler("/tmp/o2v_rss_trace.log")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("4", "both", "all"):
        config4()
    if which in ("5", "both", "all"):
        config5()
    if which in ("6", "all"):
        config6()
