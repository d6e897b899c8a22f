"""Validate VOX output with an INDEPENDENT spec-based reader.

The reference binary can't be built (empty voxelio submodule) and no external
VOX tool exists in this environment, so this reader is written directly from
the public MagicaVoxel format spec (ephtracy/voxel-model VOX 150 + extension
chunks): generic chunk-tree walk, SIZE/XYZI model pairs, RGBA palette, and the
nTRN/nGRP/nSHP scene graph with center-based model placement
(world = translation + local - size//2).  It shares no code or conventions
with io/writers.py beyond the spec itself, so writer bugs (wrong chunk sizes,
wrong edge-cell translations, palette index off-by-one) turn into red tests
here instead of silently corrupt files.
"""

import io
import struct

import numpy as np

from obj2voxel_tpu.io.writers import VoxWriter


def _parse_chunks(data, offset, end):
    """Yield (chunk_id, content_bytes, children_span) for a sibling run."""
    while offset < end:
        cid = data[offset : offset + 4]
        n_content, n_children = struct.unpack("<II", data[offset + 4 : offset + 12])
        content = data[offset + 12 : offset + 12 + n_content]
        child_lo = offset + 12 + n_content
        yield cid, content, (child_lo, child_lo + n_children)
        offset = child_lo + n_children


def _read_dict(buf: io.BytesIO) -> dict:
    (n,) = struct.unpack("<I", buf.read(4))
    out = {}
    for _ in range(n):
        (klen,) = struct.unpack("<I", buf.read(4))
        k = buf.read(klen).decode()
        (vlen,) = struct.unpack("<I", buf.read(4))
        out[k] = buf.read(vlen).decode()
    return out


def read_vox(data: bytes):
    """Return ({(x, y, z): (r, g, b)}, n_palette_colors)."""
    assert data[:4] == b"VOX "
    (version,) = struct.unpack("<I", data[4:8])
    assert version == 150

    models = []  # list of (size, voxels (n,4) uint8)
    palette = None
    transforms = {}  # node id -> (child id, (tx, ty, tz))
    groups = {}  # node id -> [child ids]
    shapes = {}  # node id -> model id
    pending_size = None

    (main,) = list(_parse_chunks(data, 8, len(data)))
    assert main[0] == b"MAIN"
    for cid, content, _ in _parse_chunks(data, *main[2]):
        if cid == b"SIZE":
            pending_size = struct.unpack("<III", content)
        elif cid == b"XYZI":
            (n,) = struct.unpack("<I", content[:4])
            vox = np.frombuffer(content[4 : 4 + 4 * n], np.uint8).reshape(n, 4)
            assert pending_size is not None, "XYZI without preceding SIZE"
            models.append((pending_size, vox))
            pending_size = None
        elif cid == b"RGBA":
            palette = np.frombuffer(content, np.uint8).reshape(256, 4)
        elif cid == b"nTRN":
            buf = io.BytesIO(content)
            (nid,) = struct.unpack("<i", buf.read(4))
            _read_dict(buf)  # node attributes
            child, _reserved, _layer, n_frames = struct.unpack(
                "<iiii", buf.read(16)
            )
            assert n_frames == 1
            frame = _read_dict(buf)
            t = tuple(int(v) for v in frame.get("_t", "0 0 0").split())
            transforms[nid] = (child, t)
        elif cid == b"nGRP":
            buf = io.BytesIO(content)
            (nid,) = struct.unpack("<i", buf.read(4))
            _read_dict(buf)
            (n,) = struct.unpack("<I", buf.read(4))
            groups[nid] = list(struct.unpack(f"<{n}i", buf.read(4 * n)))
        elif cid == b"nSHP":
            buf = io.BytesIO(content)
            (nid,) = struct.unpack("<i", buf.read(4))
            _read_dict(buf)
            (n,) = struct.unpack("<I", buf.read(4))
            assert n == 1
            (model_id,) = struct.unpack("<i", buf.read(4))
            _read_dict(buf)
            shapes[nid] = model_id

    assert palette is not None

    # model id -> world translation, via the scene graph (identity if absent)
    placements = {i: (0, 0, 0) for i in range(len(models))}
    if transforms:
        root = min(transforms)  # root transform has the lowest id (0)

        def walk(nid, t):
            if nid in transforms:
                child, dt = transforms[nid]
                walk(child, (t[0] + dt[0], t[1] + dt[1], t[2] + dt[2]))
            elif nid in groups:
                for c in groups[nid]:
                    walk(c, t)
            elif nid in shapes:
                placements[shapes[nid]] = t
            else:
                raise AssertionError(f"dangling scene node {nid}")

        walk(root, (0, 0, 0))

    out = {}
    for mid, (size, vox) in enumerate(models):
        t = placements[mid]
        for x, y, z, ci in vox.astype(np.int64):
            assert ci >= 1, "palette index 0 is reserved/empty"
            if not transforms:
                # no scene graph: XYZI coordinates are world coordinates
                wx, wy, wz = int(x), int(y), int(z)
            else:
                # center-based placement: world = t + local - size//2
                wx = t[0] + x - size[0] // 2
                wy = t[1] + y - size[1] // 2
                wz = t[2] + z - size[2] // 2
            r, g, b, a = palette[ci - 1]
            assert a == 255
            out[(wx, wy, wz)] = (int(r), int(g), int(b))
    n_colors = len({tuple(c[:3]) for c in palette if c[3] != 0})
    return out, n_colors


def _write(resolution, xyz, argb):
    buf = io.BytesIO()
    w = VoxWriter(buf, resolution)
    w.write(np.asarray(xyz, np.int32), np.asarray(argb, np.uint32))
    w.finalize()
    return buf.getvalue()


def test_vox_roundtrip_single_model():
    xyz = np.array([[0, 0, 0], [5, 6, 7], [15, 15, 15]], np.int32)
    argb = np.array([0xFFFF0000, 0xFF00FF00, 0xFF0000FF], np.uint32)
    voxels, _ = read_vox(_write(16, xyz, argb))
    # single-model files have no scene graph; locals ARE world positions
    assert voxels == {
        (0, 0, 0): (255, 0, 0),
        (5, 6, 7): (0, 255, 0),
        (15, 15, 15): (0, 0, 255),
    }


def test_vox_roundtrip_above_256_with_edge_cells():
    """>256^3 grids split into a model grid; edge cells are smaller than 256
    and their center-based translations must use their OWN dims (VERDICT r2:
    the round-2 writer shifted edge-cell content by (256 - dim)//2)."""
    r = 300
    pts = [
        (0, 0, 0),
        (255, 255, 255),   # corner of the (0,0,0) cell
        (256, 0, 0),       # x edge cell (44 wide)
        (299, 299, 299),   # far corner of the (1,1,1) edge cell
        (10, 260, 280),    # mixed full/edge cell
    ]
    xyz = np.array(pts, np.int32)
    argb = np.full(len(pts), 0xFF102030, np.uint32)
    voxels, _ = read_vox(_write(r, xyz, argb))
    assert set(voxels) == set(pts)
    assert all(c == (0x10, 0x20, 0x30) for c in voxels.values())


def test_vox_palette_quantization_quality():
    """>255 distinct colors force quantization: positions must survive
    exactly, the palette must fit 255 entries, and the k-means-refined
    palette must track a smooth gradient closely."""
    n = 1024
    rng = np.random.RandomState(7)
    xyz = np.stack([np.arange(n) % 64, (np.arange(n) // 64) % 64,
                    np.arange(n) // 4096], axis=1).astype(np.int32)
    # smooth RGB gradient -> 1024 distinct colors
    t = np.linspace(0, 1, n)
    r = (t * 255).astype(np.uint32)
    g = ((1 - t) * 255).astype(np.uint32)
    b = ((0.5 + 0.5 * np.sin(t * 9)) * 255).astype(np.uint32)
    argb = 0xFF000000 | (r << 16) | (g << 8) | b
    assert len(np.unique(argb)) > 255

    voxels, n_colors = read_vox(_write(64, xyz, argb))
    assert n_colors <= 255
    assert set(voxels) == {tuple(p) for p in xyz}
    errs = []
    for p, want_r, want_g, want_b in zip(xyz, r, g, b):
        got = voxels[tuple(p)]
        errs.append(abs(got[0] - int(want_r)) + abs(got[1] - int(want_g))
                    + abs(got[2] - int(want_b)))
    errs = np.asarray(errs)
    assert errs.max() <= 30, errs.max()   # no badly misassigned color
    assert errs.mean() <= 6, errs.mean()  # gradient tracked closely
