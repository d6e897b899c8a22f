"""Texture sampling and color strategy tests (reference: triangle.hpp:181-194,
io.cpp:437-460; not covered by the reference's own tests -- SURVEY.md sec 4
notes colors/textures as untested there)."""

import numpy as np
import pytest

from obj2voxel_tpu import constants as C
from obj2voxel_tpu.engine import TriangleSoup, voxelize_soup
from obj2voxel_tpu.ops.color import TexturePool


def make_plane_soup(tri_type, rgb=(1.0, 1.0, 1.0), tex=-1):
    # one unit quad at z=0.5 with full UV coverage
    verts = np.array(
        [
            [[0, 0, 0.5], [1, 0, 0.5], [1, 1, 0.5]],
            [[0, 0, 0.5], [1, 1, 0.5], [0, 1, 0.5]],
        ],
        np.float32,
    )
    uvs = np.array(
        [
            [[0, 0], [1, 0], [1, 1]],
            [[0, 0], [1, 1], [0, 1]],
        ],
        np.float32,
    )
    n = 2
    return TriangleSoup(
        verts=verts,
        uvs=uvs,
        types=np.full(n, tri_type, np.int32),
        rgb=np.tile(np.asarray(rgb, np.float32), (n, 1)),
        tex=np.full(n, tex, np.int32),
    )


BOUNDS = (np.zeros(3, np.float32), np.ones(3, np.float32))


def collect(soup, pool=None, **kw):
    out = {}
    for xyz, argb in voxelize_soup(
        soup, pool, resolution=8, bounds=BOUNDS, pair_tile=1 << 12, **kw
    ):
        for v, c in zip(xyz, argb):
            out[tuple(v)] = int(c)
    return out


def test_materialless_is_white():
    vox = collect(make_plane_soup(C.TRI_MATERIALLESS))
    assert vox
    assert all(c == 0xFFFFFFFF for c in vox.values())


def test_untextured_flat_color():
    vox = collect(make_plane_soup(C.TRI_UNTEXTURED, rgb=(1.0, 0.0, 0.0)))
    assert vox
    assert all(c == 0xFFFF0000 for c in vox.values())


def test_textured_sampling_with_v_flip():
    # 1x2 texture: top half (v near 1 after flip -> image row 0) red,
    # bottom half green.  colorAt samples (u, 1-v) -- reference
    # triangle.hpp:190 -- so uv.v=1 reads image row 0.
    img = np.zeros((2, 1), np.uint32)
    img[0, 0] = 0xFFFF0000  # red: sampled when uv.v in upper half
    img[1, 0] = 0xFF00FF00  # green: sampled when uv.v in lower half
    pool = TexturePool()
    tid = pool.add(img, C.UV_CLAMP)
    vox = collect(make_plane_soup(C.TRI_TEXTURED, tex=tid), pool=pool)
    assert vox
    colors = set(vox.values())
    assert colors <= {0xFFFF0000, 0xFF00FF00}
    assert len(colors) == 2  # both halves appear
    # uv.v maps to y in voxel space here: high y -> v near 1 -> red
    ys = sorted({v[1] for v in vox})
    hi_y, lo_y = ys[-1], ys[0]
    hi_colors = {c for v, c in vox.items() if v[1] == hi_y}
    lo_colors = {c for v, c in vox.items() if v[1] == lo_y}
    assert hi_colors == {0xFFFF0000}
    assert lo_colors == {0xFF00FF00}


def test_blend_produces_weighted_mean():
    # two coincident planes, one red one blue, equal areas -> blend gives
    # magenta-ish mix; max picks one of them
    red = make_plane_soup(C.TRI_UNTEXTURED, rgb=(1.0, 0.0, 0.0))
    blue = make_plane_soup(C.TRI_UNTEXTURED, rgb=(0.0, 0.0, 1.0))
    both = TriangleSoup(
        verts=np.concatenate([red.verts, blue.verts]),
        uvs=np.concatenate([red.uvs, blue.uvs]),
        types=np.concatenate([red.types, blue.types]),
        rgb=np.concatenate([red.rgb, blue.rgb]),
        tex=np.concatenate([red.tex, blue.tex]),
    )
    blend = collect(both, strategy=C.BLEND_STRATEGY)
    assert blend
    for c in blend.values():
        r = (c >> 16) & 0xFF
        b = c & 0xFF
        assert abs(r - 128) <= 1 and abs(b - 128) <= 1, hex(c)

    mx = collect(both, strategy=C.MAX_STRATEGY)
    for c in mx.values():
        assert c in (0xFFFF0000, 0xFF0000FF)
