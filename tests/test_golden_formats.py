"""Golden-byte fixtures for every output codec (round-5, VERDICT item 8).

The committed files under tests/golden/ are the frozen output bytes of the
writers for the deterministic voxel sets in golden_voxels.py.  The round-3
spec-readers (test_vox_reader.py, test_ply_reader.py) check semantic
correctness against the public format specs; THESE tests pin the exact
bytes so an accidental codec change fails here rather than in a user's
MagicaVoxel import.  Regenerate deliberately with
`python -m tests.golden_voxels` and review the diff.
"""

import os

import pytest

from golden_voxels import CASES, render

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

PAIRS = [
    (case, fmt) for case, (_, fmts) in CASES.items() for fmt in fmts
]


@pytest.mark.parametrize("case,fmt", PAIRS)
def test_golden_bytes(case, fmt):
    path = os.path.join(GOLDEN, f"{case}.{fmt}")
    with open(path, "rb") as f:
        want = f.read()
    got = render(case, fmt)
    assert got == want, (
        f"{case}.{fmt}: output bytes changed ({len(got)} vs {len(want)} "
        "bytes); if intentional, regenerate via python -m tests.golden_voxels"
    )


def test_golden_vox_reopens():
    """The scene-graph fixture parses back through the independent VOX spec
    reader (round-3) with the exact voxel set."""
    import numpy as np

    from golden_voxels import scene_graph_set
    from test_vox_reader import read_vox

    res, xyz, argb = scene_graph_set()
    path = os.path.join(GOLDEN, "scene_graph.vox")
    with open(path, "rb") as f:
        got, _ = read_vox(f.read())
    want = {
        (int(x), int(y), int(z)): (
            (int(c) >> 16) & 0xFF, (int(c) >> 8) & 0xFF, int(c) & 0xFF
        )
        for (x, y, z), c in zip(xyz, np.asarray(argb))
    }
    assert got == want
