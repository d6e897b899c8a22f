"""Deterministic voxel sets for the golden-byte format fixtures.

The byte files under tests/golden/ were produced from these sets by
`python -m tests.golden_voxels` and COMMITTED; test_golden_formats.py
re-runs the writers and requires byte equality, so any codec change that
alters output bytes fails a test instead of a user's file
(reference layouts: README.adoc:210-263, writers at reference
src/io.cpp:570-636).
"""

from __future__ import annotations

import io
import os

import numpy as np


def small_set():
    """27 voxels in a 64-grid corner arc with assorted colors (exercises
    palette paths without quantization)."""
    rng = np.random.RandomState(42)
    t = np.arange(27)
    xyz = np.stack([t % 5 + 1, (t * 7) % 11 + 2, (t * 3) % 13 + 3], axis=1)
    xyz = np.unique(xyz, axis=0).astype(np.int32)
    argb = (
        0xFF000000
        | (rng.randint(0, 256, len(xyz)).astype(np.uint32) << 16)
        | (rng.randint(0, 256, len(xyz)).astype(np.uint32) << 8)
        | rng.randint(0, 256, len(xyz)).astype(np.uint32)
    ).astype(np.uint32)
    return 64, xyz, argb


def scene_graph_set():
    """Voxels straddling the 256-model boundary of a 300-grid: exercises the
    VOX multi-model scene-graph path (io/writers.py VoxWriter), where format
    risk concentrates (VERDICT round-4 missing #2)."""
    line = np.arange(200, 300, dtype=np.int32)
    xyz = np.stack([line, np.full_like(line, 255), line[::-1]], axis=1)
    xyz = np.concatenate(
        [xyz, np.array([[0, 0, 0], [299, 299, 299], [256, 0, 256]], np.int32)]
    )
    argb = (0xFF000000 | (np.arange(len(xyz), dtype=np.uint32) * 77 % 0xFFFFFF)).astype(
        np.uint32
    )
    return 300, xyz, argb


def quantized_set():
    """400 distinct colors on a 64-grid: forces VOX's 255-color median-cut +
    Lloyd quantization (deterministic, io/writers._quantize_palette)."""
    rng = np.random.RandomState(7)
    n = 400
    xyz = np.stack(
        [rng.permutation(n) % 64, rng.permutation(n) % 64, np.arange(n) % 64],
        axis=1,
    ).astype(np.int32)
    argb = (0xFF000000 | rng.randint(0, 1 << 24, n).astype(np.uint32)).astype(
        np.uint32
    )
    return 64, xyz, argb


CASES = {
    "small": (small_set, ("vl32", "ply", "xyzrgb", "qef", "vox")),
    "scene_graph": (scene_graph_set, ("vox",)),
    "quantized": (quantized_set, ("vox", "qef")),
}


def render(case: str, fmt: str) -> bytes:
    from obj2voxel_tpu.io.writers import make_writer

    fn, _ = CASES[case]
    resolution, xyz, argb = fn()
    buf = io.BytesIO()
    w = make_writer(buf, fmt, resolution)
    # two writes exercise the streaming/buffering split
    w.write(xyz[: len(xyz) // 2], argb[: len(xyz) // 2])
    w.write(xyz[len(xyz) // 2 :], argb[len(xyz) // 2 :])
    w.finalize()
    return buf.getvalue()


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    golden = os.path.join(here, "golden")
    os.makedirs(golden, exist_ok=True)
    for case, (_, fmts) in CASES.items():
        for fmt in fmts:
            path = os.path.join(golden, f"{case}.{fmt}")
            with open(path, "wb") as f:
                f.write(render(case, fmt))
            print(f"wrote {path}")


if __name__ == "__main__":
    main()
