"""Independent PLY reader validating PlyWriter output end to end.

Like tests/test_vox_reader.py, this reader is written from the PUBLIC PLY
specification (Greg Turk's Stanford polygon format: ascii header of
element/property declarations terminated by end_header, then packed binary
payload in declaration order) — NOT from the writer's code — so it acts as an
external-reader differential check: any reader following the spec must
recover exactly the voxels the writer was given, regardless of the writer's
300-byte-header padding trick (reference README.adoc:231-237).
"""

import io

import numpy as np
import pytest

from obj2voxel_tpu.io.writers import PlyWriter

# PLY scalar type name -> numpy big-endian dtype (per the public spec; both
# the classic names and the int8/uint8/... aliases are legal in headers)
_PLY_TYPES = {
    "char": "b", "int8": "b",
    "uchar": "B", "uint8": "B",
    "short": ">i2", "int16": ">i2",
    "ushort": ">u2", "uint16": ">u2",
    "int": ">i4", "int32": ">i4",
    "uint": ">u4", "uint32": ">u4",
    "float": ">f4", "float32": ">f4",
    "double": ">f8", "float64": ">f8",
}


def read_ply(data: bytes):
    """Spec-driven PLY reader: returns {element: structured ndarray}.

    Only scalar properties and binary_big_endian 1.0 are supported (all this
    codebase ever writes); list properties or other formats raise.
    """
    # locate the header end line by line (an exact "end_header" line per the
    # spec) -- a bare substring search could split early inside a comment
    off, lines = 0, []
    while True:
        nl = data.index(b"\n", off)
        line = data[off:nl].decode("ascii").rstrip("\r")
        lines.append(line)
        off = nl + 1
        if line == "end_header":
            break
    payload = data[off:]
    assert lines[0] == "ply", "missing magic"

    fmt = None
    elements = []  # (name, count, [(prop_name, dtype_str), ...])
    for ln in lines[1:]:
        tok = ln.split()
        if not tok or tok[0] == "comment":
            continue
        if tok[0] == "format":
            fmt = (tok[1], tok[2])
        elif tok[0] == "element":
            elements.append((tok[1], int(tok[2]), []))
        elif tok[0] == "property":
            if tok[1] == "list":
                raise NotImplementedError("list property")
            elements[-1][2].append((tok[2], _PLY_TYPES[tok[1]]))
        elif tok[0] == "end_header":
            break
    assert fmt == ("binary_big_endian", "1.0"), fmt

    out, off = {}, 0
    for name, count, props in elements:
        dt = np.dtype(props)
        nbytes = dt.itemsize * count
        out[name] = np.frombuffer(payload[off:off + nbytes], dt)
        off += nbytes
    assert off == len(payload), "trailing bytes after declared elements"
    return out


def _roundtrip(xyz, argb):
    buf = io.BytesIO()
    w = PlyWriter(buf, 64)
    w.write(np.asarray(xyz, np.int32), np.asarray(argb, np.uint32))
    w.finalize()
    return read_ply(buf.getvalue())


def test_ply_reader_recovers_voxels():
    xyz = np.array([[1, 2, 3], [4, 5, 6], [63, 0, 63]], np.int32)
    argb = np.array([0xFF112233, 0x80AABBCC, 0x01000000], np.uint32)
    v = _roundtrip(xyz, argb)["vertex"]
    assert v.shape[0] == 3
    np.testing.assert_array_equal(
        np.stack([v["x"], v["y"], v["z"]], axis=1), xyz
    )
    # argb u32 big-endian decomposes to the declared uchar a,r,g,b fields
    np.testing.assert_array_equal(v["alpha"], (argb >> 24).astype(np.uint8))
    np.testing.assert_array_equal(v["red"], (argb >> 16).astype(np.uint8))
    np.testing.assert_array_equal(v["green"], (argb >> 8).astype(np.uint8))
    np.testing.assert_array_equal(v["blue"], argb.astype(np.uint8))


def test_ply_reader_multibatch_and_count_patch():
    """The header's vertex count is patched at finalize; a spec reader must
    see the total across all write() batches."""
    buf = io.BytesIO()
    w = PlyWriter(buf, 64)
    rng = np.random.default_rng(7)
    total = 0
    chunks = []
    for n in (5, 1, 17):
        xyz = rng.integers(0, 64, (n, 3), dtype=np.int32)
        argb = rng.integers(0, 2**32, (n,), dtype=np.uint32)
        w.write(xyz, argb)
        chunks.append((xyz, argb))
        total += n
    w.finalize()
    v = read_ply(buf.getvalue())["vertex"]
    assert v.shape[0] == total
    cat_xyz = np.concatenate([c[0] for c in chunks])
    np.testing.assert_array_equal(
        np.stack([v["x"], v["y"], v["z"]], axis=1), cat_xyz
    )


def test_ply_reader_empty_file():
    v = _roundtrip(np.empty((0, 3), np.int32), np.empty((0,), np.uint32))
    assert v["vertex"].shape[0] == 0


def test_ply_reader_end_to_end_voxelization(tmp_path):
    """Full pipeline: voxelize a unit cube through the Instance API into a
    .ply file, then read it back with the spec reader and check the
    closed-form voxel count (8 + 12(r-2) + 6(r-2)^2 at r=64)."""
    from obj2voxel_tpu import api

    obj = tmp_path / "cube.obj"
    verts = [(x, y, z) for z in (0, 1) for y in (0, 1) for x in (0, 1)]
    faces = [
        (1, 2, 4, 3), (5, 7, 8, 6), (1, 5, 6, 2),
        (3, 4, 8, 7), (1, 3, 7, 5), (2, 6, 8, 4),
    ]
    with open(obj, "w") as f:
        for v in verts:
            f.write("v %d %d %d\n" % v)
        for q in faces:
            f.write("f %d %d %d %d\n" % q)

    out = tmp_path / "cube.ply"
    inst = api.Instance()
    inst.set_input_file(str(obj))
    inst.set_output_file(str(out))
    inst.set_resolution(64)
    assert inst.voxelize() == 0

    v = read_ply(out.read_bytes())["vertex"]
    r = 64
    assert v.shape[0] == 8 + 12 * (r - 2) + 6 * (r - 2) ** 2
    # surface shell only: every voxel touches a face of the cube
    on_face = (
        (v["x"] == 0) | (v["x"] == r - 1)
        | (v["y"] == 0) | (v["y"] == r - 1)
        | (v["z"] == 0) | (v["z"] == r - 1)
    )
    assert on_face.all()
