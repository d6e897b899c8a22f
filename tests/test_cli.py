"""CLI behavior tests (reference: src/main.cpp semantics).  Only fast paths:
argument validation, exit codes, version -- the voxelizing runs are covered by
the pipeline tests."""

import numpy as np
import pytest

from obj2voxel_tpu import cli
from obj2voxel_tpu import constants as C


def test_version_exits_zero(capsys):
    assert cli.main(["-V"]) == 0
    out = capsys.readouterr().out
    assert "Version" in out


def test_missing_args_prints_help(capsys):
    assert cli.main([]) == 1
    assert "usage" in capsys.readouterr().out.lower()


def test_missing_resolution(capsys):
    assert cli.main(["in.obj", "out.vl32"]) == 1


def test_bad_output_format(tmp_path):
    obj = tmp_path / "t.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    with pytest.raises(SystemExit) as e:
        cli.main([str(obj), str(tmp_path / "out.bogus"), "-r", "8"])
    assert e.value.code == 1


def test_bad_permutation(tmp_path):
    obj = tmp_path / "t.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    assert cli.main([str(obj), str(tmp_path / "out.vl32"), "-r", "8", "-p", "qqq"]) == 1


def test_unknown_input_extension_assumes_obj(tmp_path, pair_tile):
    # reference warns and assumes OBJ for undetectable input types
    # (main.cpp:86-96)
    mesh = tmp_path / "mesh_no_ext"
    mesh.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    out = tmp_path / "out.vl32"
    assert cli.main([str(mesh), str(out), "-r", "8"]) == 0
    assert out.stat().st_size % 16 == 0
    assert out.stat().st_size > 0


def test_end_to_end_vl32(tmp_path):
    obj = tmp_path / "cube.obj"
    lines = []
    for v in [(0,0,0),(0,0,1),(0,1,0),(0,1,1),(1,0,0),(1,0,1),(1,1,0),(1,1,1)]:
        lines.append(f"v {v[0]} {v[1]} {v[2]}")
    for q in [(1,2,4,3),(5,7,8,6),(1,5,6,2),(3,4,8,7),(1,3,7,5),(2,6,8,4)]:
        lines.append(f"f {q[0]} {q[1]} {q[2]} {q[3]}")
    obj.write_text("\n".join(lines) + "\n")
    out = tmp_path / "cube.vl32"
    assert cli.main([str(obj), str(out), "-r", "16"]) == 0
    expected = 8 + 12 * 14 + 6 * 14 * 14
    assert out.stat().st_size == expected * 16
