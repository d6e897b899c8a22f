"""Wavefront OBJ + MTL loading (reference: src/io.cpp:194-393 via tinyobj).

Produces a TriangleSoup + TexturePool.  Material resolution follows the
reference's ObjTriangleStream::next (io.cpp:276-303):

* no material: textured with the instance's fallback texture when the face has
  UVs and a fallback was provided, else materialless (white);
* material with a diffuse texture and face UVs: textured;
* otherwise: flat diffuse color.

Texture paths get backslashes replaced by '/' (io.cpp:437-441) and textures are
loaded with REPEAT wrap (io.cpp:456).  Faces with more than three vertices are
fan-triangulated, which is tinyobj's default triangulation.
"""

from __future__ import annotations

import os

import numpy as np

from ..constants import TRI_MATERIALLESS, TRI_TEXTURED, TRI_UNTEXTURED, UV_WRAP
from ..engine import TriangleSoup
from ..ops.color import TexturePool
from ..utils.log import log
from .png_io import load_image


def _parse_mtl(path: str):
    """Parse an MTL file -> {name: {"kd": (r,g,b), "map_kd": str|None}}."""
    materials = {}
    cur = None
    try:
        with open(path, "r", errors="replace") as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                key = parts[0]
                if key == "newmtl" and len(parts) > 1:
                    cur = {"kd": (1.0, 1.0, 1.0), "map_kd": None}
                    materials[parts[1]] = cur
                elif cur is None:
                    continue
                elif key == "Kd" and len(parts) >= 4:
                    cur["kd"] = tuple(float(x) for x in parts[1:4])
                elif key == "map_Kd" and len(parts) > 1:
                    # the texture name is the last token (options are rare)
                    cur["map_kd"] = parts[-1]
    except OSError:
        log.warning(f"Failed to open material library {path}")
    return materials


def _resolve_index(idx: int, count: int) -> int:
    """OBJ indices are 1-based; negative values are relative to the end."""
    return idx - 1 if idx > 0 else count + idx


def load_obj(path: str, default_texture_id: int = -1, pool: TexturePool | None = None):
    """Load an OBJ file.  Returns (TriangleSoup, TexturePool) or None on error."""
    if pool is None:
        pool = TexturePool()

    try:
        with open(path, "r", errors="replace") as f:
            lines = f.read().splitlines()
    except OSError:
        log.error(f'Failed to open OBJ file: "{path}"')
        return None

    obj_dir = os.path.dirname(os.path.abspath(path))

    positions: list[tuple] = []
    texcoords: list[tuple] = []
    materials: dict = {}
    tex_ids: dict[str, int] = {}

    # Per-face accumulation
    face_v: list[int] = []
    face_vt: list[int] = []
    face_type: list[int] = []
    face_rgb: list[tuple] = []
    face_tex: list[int] = []

    cur_mtl = None

    def load_material_texture(name: str) -> int:
        if name in tex_ids:
            return tex_ids[name]
        sanitized = name.replace("\\", "/")
        candidates = [sanitized, os.path.join(obj_dir, sanitized)]
        img = None
        for cand in candidates:
            img = load_image(cand)
            if img is not None:
                break
        if img is None:
            log.warning(f'Failed to open texture file "{sanitized}"')
            tex_ids[name] = -1
            return -1
        tid = pool.add(img, UV_WRAP)
        tex_ids[name] = tid
        log.info(f'Loaded texture "{sanitized}"')
        return tid

    for raw in lines:
        if not raw or raw[0] == "#":
            continue
        parts = raw.split()
        if not parts:
            continue
        key = parts[0]
        if key == "v":
            positions.append((float(parts[1]), float(parts[2]), float(parts[3])))
        elif key == "vt":
            u = float(parts[1])
            v = float(parts[2]) if len(parts) > 2 else 0.0
            texcoords.append((u, v))
        elif key == "f":
            nv = len(positions)
            nt = len(texcoords)
            corners = []
            has_uv = True
            for tok in parts[1:]:
                comp = tok.split("/")
                vi = _resolve_index(int(comp[0]), nv)
                if len(comp) > 1 and comp[1]:
                    ti = _resolve_index(int(comp[1]), nt)
                else:
                    ti = -1
                    has_uv = False
                corners.append((vi, ti))
            if len(corners) < 3:
                continue

            mtl = materials.get(cur_mtl)
            if mtl is None:
                if has_uv and default_texture_id >= 0:
                    ftype, frgb, ftex = TRI_TEXTURED, (1.0, 1.0, 1.0), default_texture_id
                else:
                    ftype, frgb, ftex = TRI_MATERIALLESS, (1.0, 1.0, 1.0), -1
            elif has_uv and mtl["map_kd"]:
                tid = load_material_texture(mtl["map_kd"])
                if tid >= 0:
                    ftype, frgb, ftex = TRI_TEXTURED, (1.0, 1.0, 1.0), tid
                else:
                    ftype, frgb, ftex = TRI_UNTEXTURED, mtl["kd"], -1
            else:
                ftype, frgb, ftex = TRI_UNTEXTURED, mtl["kd"], -1

            for i in range(1, len(corners) - 1):
                for c in (corners[0], corners[i], corners[i + 1]):
                    face_v.append(c[0])
                    face_vt.append(c[1])
                face_type.append(ftype)
                face_rgb.append(frgb)
                face_tex.append(ftex)
        elif key == "usemtl":
            cur_mtl = parts[1] if len(parts) > 1 else None
        elif key == "mtllib":
            for name in parts[1:]:
                mtl_path = name if os.path.isabs(name) else os.path.join(obj_dir, name)
                if not os.path.exists(mtl_path) and os.path.exists(name):
                    mtl_path = name
                materials.update(_parse_mtl(mtl_path))

    n = len(face_type)
    if n == 0:
        return TriangleSoup.empty(), pool

    pos = np.asarray(positions, np.float32)
    fv = np.asarray(face_v, np.int64).reshape(n, 3)
    verts = pos[fv]

    uvs = np.zeros((n, 3, 2), np.float32)
    if texcoords:
        tc = np.asarray(texcoords, np.float32)
        fvt = np.asarray(face_vt, np.int64).reshape(n, 3)
        valid = fvt >= 0
        uvs[valid] = tc[np.clip(fvt, 0, len(tc) - 1)][valid]

    soup = TriangleSoup(
        verts=np.ascontiguousarray(verts, np.float32),
        uvs=uvs,
        types=np.asarray(face_type, np.int32),
        rgb=np.asarray(face_rgb, np.float32),
        tex=np.asarray(face_tex, np.int32),
    )
    ntex = len([t for t in tex_ids.values() if t >= 0])
    log.info(f"Loaded {ntex} material textures")
    return soup, pool
