"""Scale proofs for BASELINE configs 4 and 5.

Config 4: 10M-triangle binary STL streamed through z-slabs at 2048^3 into a
          sparse VL32 file with bounded memory (reference story: 8192^3 in
          ~100 MB via chunk streaming, README.adoc:272-278).
Config 5: batched dataset generation -- 1000 small meshes voxelized in one
          device pipeline at 64^3.

Prints one JSON line per config with wall-clock and peak host RSS.
Usage: python scripts/scale_proof.py [4|5|both]
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


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("4", "both"):
        config4()
    if which in ("5", "both"):
        config5()
