"""I/O codec tests: writers (VL32/PLY/XYZRGB/QEF/VOX) and loaders (OBJ/STL).

Format contracts per reference README.adoc:210-263 and src/io.cpp."""

import io
import struct

import numpy as np
import pytest

from obj2voxel_tpu.io.stl_loader import load_stl
from obj2voxel_tpu.io.obj_loader import load_obj
from obj2voxel_tpu.io.writers import (
    PLY_HEADER_SIZE,
    PlyWriter,
    QefWriter,
    Vl32Writer,
    VoxWriter,
    XyzRgbWriter,
    detect_file_type,
)

XYZ = np.array([[1, 2, 3], [4, 5, 6]], np.int32)
ARGB = np.array([0xFF112233, 0xFFAABBCC], np.uint32)


def test_vl32_layout():
    buf = io.BytesIO()
    w = Vl32Writer(buf, 16)
    w.write(XYZ, ARGB)
    w.finalize()
    data = buf.getvalue()
    assert len(data) == 2 * 16  # 16 bytes per voxel
    x, y, z, argb = struct.unpack(">iiiI", data[:16])
    assert (x, y, z) == (1, 2, 3)
    assert argb == 0xFF112233


def test_ply_is_vl32_plus_300_byte_header():
    vbuf = io.BytesIO()
    Vl32Writer(vbuf, 16).write(XYZ, ARGB)

    pbuf = io.BytesIO()
    w = PlyWriter(pbuf, 16)
    w.write(XYZ, ARGB)
    w.finalize()
    data = pbuf.getvalue()
    # bit-identical to VL32 when the first 300 bytes are removed
    # (reference README.adoc:231-237)
    assert data[PLY_HEADER_SIZE:] == vbuf.getvalue()
    header = data[:PLY_HEADER_SIZE]
    assert header.startswith(b"ply\n")
    assert header.endswith(b"end_header\n")
    assert b"element vertex 000000000002" in header
    assert b"format binary_big_endian 1.0" in header


def test_xyzrgb_ascii():
    buf = io.BytesIO()
    w = XyzRgbWriter(buf, 16)
    w.write(XYZ, ARGB)
    w.finalize()
    lines = buf.getvalue().decode().strip().splitlines()
    assert lines[0] == "1 2 3 17 34 51"
    assert lines[1] == "4 5 6 170 187 204"


def test_qef_format():
    buf = io.BytesIO()
    w = QefWriter(buf, 16)
    w.write(XYZ, ARGB)
    w.finalize()
    lines = buf.getvalue().decode().splitlines()
    assert lines[0] == "Qubicle Exchange Format"
    assert lines[1] == "Version 0.2"
    assert lines[2] == "www.minddesk.com"
    assert lines[3] == "16 16 16"
    ncolors = int(lines[4])
    assert ncolors == 2
    voxel_lines = lines[5 + ncolors :]
    assert len(voxel_lines) == 2
    parts = voxel_lines[0].split()
    assert [int(p) for p in parts[:3]] == [1, 2, 3]


def test_vox_format_small():
    buf = io.BytesIO()
    w = VoxWriter(buf, 16)
    w.write(XYZ, ARGB)
    w.finalize()
    data = buf.getvalue()
    assert data[:4] == b"VOX "
    assert struct.unpack("<I", data[4:8])[0] == 150
    assert data[8:12] == b"MAIN"
    assert b"SIZE" in data and b"XYZI" in data and b"RGBA" in data
    # XYZI voxel count
    i = data.index(b"XYZI")
    n = struct.unpack("<I", data[i + 12 : i + 16])[0]
    assert n == 2


def test_vox_large_resolution_multi_model():
    buf = io.BytesIO()
    w = VoxWriter(buf, 512)
    xyz = np.array([[10, 10, 10], [300, 300, 300]], np.int32)
    w.write(xyz, ARGB)
    w.finalize()
    data = buf.getvalue()
    assert data.count(b"SIZE") == 2
    assert data.count(b"XYZI") == 2
    assert b"nTRN" in data and b"nSHP" in data


def test_detect_file_type():
    assert detect_file_type("model.obj") == "obj"
    assert detect_file_type("model.STL") == "stl"
    assert detect_file_type("out.vl32") == "vl32"
    assert detect_file_type("noext") is None
    assert detect_file_type("x.bin", "qef") == "qef"


def test_stl_loader(tmp_path):
    path = tmp_path / "tri.stl"
    with open(path, "wb") as f:
        f.write(b"\x00" * 80)
        f.write(struct.pack("<I", 2))
        for _ in range(2):
            f.write(struct.pack("<3f", 0, 0, 1))  # normal (discarded)
            f.write(struct.pack("<9f", 0, 0, 0, 1, 0, 0, 0, 1, 0))
            f.write(struct.pack("<H", 0))
    soup = load_stl(str(path))
    assert soup is not None
    assert len(soup) == 2
    assert np.allclose(soup.verts[0], [[0, 0, 0], [1, 0, 0], [0, 1, 0]])


def test_stl_rejects_ascii(tmp_path):
    path = tmp_path / "ascii.stl"
    path.write_bytes(b"solid foo" + b" " * 100)
    assert load_stl(str(path)) is None


def test_obj_loader_basic(tmp_path):
    path = tmp_path / "tri.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2 4 3\n"
    )
    soup, pool = load_obj(str(path))
    assert len(soup) == 2
    assert np.allclose(soup.verts[0], [[0, 0, 0], [1, 0, 0], [0, 1, 0]])


def test_obj_loader_quads_fan(tmp_path):
    path = tmp_path / "quad.obj"
    path.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    soup, _ = load_obj(str(path))
    assert len(soup) == 2  # fan triangulation


def test_obj_loader_materials(tmp_path):
    (tmp_path / "m.mtl").write_text(
        "newmtl red\nKd 1.0 0.0 0.0\n"
    )
    path = tmp_path / "tri.obj"
    path.write_text(
        "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl red\nf 1 2 3\n"
    )
    soup, _ = load_obj(str(path))
    assert len(soup) == 1
    from obj2voxel_tpu.constants import TRI_UNTEXTURED

    assert soup.types[0] == TRI_UNTEXTURED
    assert np.allclose(soup.rgb[0], [1, 0, 0])


def test_obj_loader_negative_indices(tmp_path):
    path = tmp_path / "neg.obj"
    path.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    soup, _ = load_obj(str(path))
    assert len(soup) == 1
    assert np.allclose(soup.verts[0], [[0, 0, 0], [1, 0, 0], [0, 1, 0]])


def test_obj_with_texture_end_to_end(tmp_path):
    # full path: OBJ + MTL + PNG texture -> textured voxels
    from PIL import Image
    import numpy as _np

    img = _np.zeros((2, 2, 4), _np.uint8)
    img[:, :, 3] = 255
    img[0, :, 0] = 255  # top row red (v near 1 -> image row 0 after v-flip)
    img[1, :, 1] = 255  # bottom row green
    Image.fromarray(img, "RGBA").save(tmp_path / "tex.png")

    (tmp_path / "m.mtl").write_text("newmtl mat\nKd 1 1 1\nmap_Kd tex.png\n")
    (tmp_path / "plane.obj").write_text(
        "mtllib m.mtl\n"
        "v 0 0 0.5\nv 1 0 0.5\nv 1 1 0.5\nv 0 1 0.5\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl mat\n"
        "f 1/1 2/2 3/3 4/4\n"
    )
    soup, pool = load_obj(str(tmp_path / "plane.obj"))
    assert len(soup) == 2
    from obj2voxel_tpu.constants import TRI_TEXTURED

    assert all(t == TRI_TEXTURED for t in soup.types)
    assert len(pool) == 1

    from obj2voxel_tpu.engine import voxelize_soup

    bounds = (np.zeros(3, np.float32), np.ones(3, np.float32))
    colors = set()
    for xyz, argb in voxelize_soup(
        soup, pool, resolution=8, bounds=bounds, pair_tile=1 << 12
    ):
        colors.update(int(c) for c in argb)
    assert 0xFFFF0000 in colors  # red half sampled
    assert 0xFF00FF00 in colors  # green half sampled
