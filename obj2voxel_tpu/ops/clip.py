"""Vectorized triangle/voxel-cube clipping.

This is the TPU-native reformulation of the reference's recursive triangle
splitting (reference: src/voxelization.cpp:175-331, 383-424).  Instead of
maintaining dynamic triangle lists and a case analysis per splitting plane, we
clip each (triangle, voxel) pair's polygon with a branch-free, fixed-capacity
Sutherland-Hodgman pass over the voxel's six planes, batched over a whole tile
of pairs at once.

Layout
------
The pair dimension P is kept as the LAST axis of every array so each operation
is a [P]-wide vector op on the VPU (P maps onto the 8x128 lanes); the small
polygon-slot and channel dimensions are static Python loops that unroll at
trace time.  Polygons use a *closed* representation -- slot[count] duplicates
slot[0] -- so the edge walk (i, i+1) needs no per-pair ring indexing.

Epsilon/bias semantics
----------------------
The reference classifies vertices per plane as `lo` (v < plane), `planar`
(|v - plane| < EPSILON) and routes planar geometry to the *hi* side
(IS_LO_BIASED = false, reference voxelization.cpp:108-127, 192-237), with one
exception: a triangle whose vertices are ALL strictly lo is routed lo even if
they are also planar (cases (3,*), voxelization.cpp:201-205).  For occupancy
and area purposes that is equivalent to clipping with:

* keep-hi clip at plane p (reference DISCARD_LO):
    empty if all vertices lo; else inside  <=>  v > p - EPSILON
* keep-lo clip at plane p (reference DISCARD_HI):
    whole polygon if all vertices lo; else inside  <=>  v <= p - EPSILON

so a triangle lying exactly on a voxel boundary plane belongs to the voxel on
the +side, exactly like the reference.  Pieces that survive the reference's
routing with zero area get zero weight here and are dropped, which matches the
observable output (the reference drops zero-weight UVs, voxelization.cpp:466).

Weighting
---------
The reference weights each surviving piece with the whole input triangle's
area (voxelization.cpp:416-417), making the final per-voxel weight
`area * piece_count` with a decomposition-dependent piece count.  We use the
clipped polygon's actual area and its area-weighted UV centroid -- the
behavior the reference's README documents (README.adoc:287-290) and a
decomposition-independent quantity.  Occupancy (weight > 0) is identical.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import EPSILON

#: channels per polygon slot: x, y, z, u, v
_NCH = 5


def _clip_one_plane(slots, count, axis, plane, keep_hi):
    """One Sutherland-Hodgman pass over a batch of closed polygons.

    slots: list of C arrays, each (5, P) float32; closed representation
           (slots[count] == slots[0] per pair).
    count: (P,) int32 number of distinct vertices.
    plane: (P,) float32; axis: python int; keep_hi: python bool.

    Returns (slots', count') with len(slots') == len(slots) + 1.
    """
    C = len(slots)
    f32 = slots[0].dtype

    vals = [s[axis] for s in slots]  # batch-shaped each

    # vertex validity: slot i holds a distinct vertex iff i < count
    valid = [(jnp.int32(i) < count) for i in range(C)]

    # all-lo over the distinct vertices (see module docstring)
    all_lo = None
    for i in range(C - 1):  # count <= C-1 in closed representation
        lo_i = (vals[i] < plane) | ~valid[i]
        all_lo = lo_i if all_lo is None else (all_lo & lo_i)

    inside = []
    for i in range(C):
        if keep_hi:
            ins = ((plane - vals[i]) < EPSILON) & ~all_lo
        else:
            ins = all_lo | ((vals[i] < plane) & ((plane - vals[i]) >= EPSILON))
        inside.append(ins)

    # edges (i, i+1) for i < count; emissions and running destination offsets
    prefix = jnp.zeros_like(count)
    emit_cur, emit_x, dest_cur, dest_x, isect = [], [], [], [], []
    for i in range(C - 1):
        edge_valid = valid[i]  # i < count
        e_cur = inside[i] & edge_valid
        e_x = (inside[i] != inside[i + 1]) & edge_valid
        emit_cur.append(e_cur)
        emit_x.append(e_x)
        dest_cur.append(prefix)
        prefix = prefix + e_cur.astype(jnp.int32)
        dest_x.append(prefix)
        prefix = prefix + e_x.astype(jnp.int32)

        # intersection of edge (i, i+1) with the plane, matching the
        # reference's intersect_ray_axisPlane (voxelization.cpp:27-31)
        d = vals[i] - vals[i + 1]
        t = jnp.where(
            jnp.abs(d) < EPSILON, 0.0, (vals[i] - plane) / jnp.where(d == 0, 1.0, d)
        ).astype(f32)
        isect.append((1.0 - t) * slots[i] + t * slots[i + 1])

    new_count = prefix

    # scatter emissions into output slots (static double loop; dest_cur[i]
    # <= 2i and dest_x[i] <= 2i+1, so slots beyond that are unreachable)
    C_out = C + 1
    out = []
    for s in range(C_out):
        acc = jnp.zeros_like(slots[0])
        for i in range(C - 1):
            if s > 2 * i + 1:
                continue
            m_cur = emit_cur[i] & (dest_cur[i] == s)
            acc = acc + jnp.where(m_cur, slots[i], 0.0)
            m_x = emit_x[i] & (dest_x[i] == s)
            acc = acc + jnp.where(m_x, isect[i], 0.0)
        out.append(acc)

    # close the polygon: slot[new_count] = slot[0]
    closed = [out[0]]
    for s in range(1, C_out):
        closed.append(out[s] + jnp.where(new_count == s, out[0], 0.0))

    return closed, new_count


def _clip_polygons(slots, count, voxel_f):
    """Run all six plane clips in the reference's order
    (voxelization.cpp:388-405): keep-hi at pos[axis], then keep-lo at
    pos[axis]+1, axes x,y,z each."""
    for hi in (False, True):
        for axis in range(3):
            plane = voxel_f[axis] + (1.0 if hi else 0.0)
            slots, count = _clip_one_plane(slots, count, axis, plane, keep_hi=not hi)
    return slots, count


def _area_uv(slots, count):
    """Area + area-weighted UV centroid via a triangle fan from slot 0.

    Returns (weight, uv_u, uv_v), each batch-shaped like `count`."""
    C = len(slots)

    x0, y0, z0, u0, v0 = slots[0]
    weight = jnp.zeros_like(x0)
    uv_num_u = jnp.zeros_like(x0)
    uv_num_v = jnp.zeros_like(x0)
    for i in range(1, C - 1):
        a = slots[i]
        b = slots[i + 1]
        ax, ay, az = a[0] - x0, a[1] - y0, a[2] - z0
        bx, by, bz = b[0] - x0, b[1] - y0, b[2] - z0
        cx = ay * bz - az * by
        cy = az * bx - ax * bz
        cz = ax * by - ay * bx
        piece_valid = jnp.int32(i + 1) < count
        area = 0.5 * jnp.sqrt(cx * cx + cy * cy + cz * cz)
        area = jnp.where(piece_valid, area, 0.0)
        weight = weight + area
        uv_num_u = uv_num_u + area * ((u0 + a[3] + b[3]) / 3.0)
        uv_num_v = uv_num_v + area * ((v0 + a[4] + b[4]) / 3.0)

    safe_w = jnp.where(weight > 0, weight, 1.0)
    return weight, uv_num_u / safe_w, uv_num_v / safe_w


def clip_channels(tri_data, vox_data):
    """Channel-major clip: tri_data (16, P) f32 (rows 0..8 vertex coords
    x0 y0 z0 x1 y1 z1 x2 y2 z2, rows 9..14 UVs, row 15 pad), vox_data (>=3, P)
    f32 voxel min corner.  Returns (weight (1, P), uv_u (1, P), uv_v (1, P)).

    This is the same computation the Pallas kernel runs per block; on CPU it
    serves as the oracle/fallback with identical layout."""
    t = tri_data

    def slot(i):
        return jnp.concatenate(
            [t[3 * i : 3 * i + 3, :], t[9 + 2 * i : 9 + 2 * i + 2, :]], axis=0
        )

    s0 = slot(0)
    slots = [s0, slot(1), slot(2), s0]
    count = jnp.full((1, t.shape[1]), 3, jnp.int32)
    voxel_f = [vox_data[0:1, :], vox_data[1:2, :], vox_data[2:3, :]]
    slots, count = _clip_polygons(slots, count, voxel_f)
    return _area_uv(slots, count)


def clip_triangles_to_voxels(verts, uvs, voxel_pos):
    """Clip each triangle against its voxel's cube; return (weight, uv).

    verts:     (P, 3, 3) float32 triangle vertices in voxel-grid space
    uvs:       (P, 3, 2) float32 per-vertex texture coordinates
    voxel_pos: (P, 3)    int32/float32 voxel minimum corner

    Returns:
      weight: (P,) float32 -- clipped polygon area; 0 where the triangle does
              not occupy the voxel under the reference's epsilon rules.
      uv:     (P, 2) float32 -- area-weighted UV centroid of the clipped region.
    """
    P = verts.shape[0]
    f32 = jnp.float32
    verts = verts.astype(f32)
    uvs = uvs.astype(f32)
    voxel_f = [voxel_pos[:, a].astype(f32) for a in range(3)]

    def slot(i):
        return jnp.stack(
            [verts[:, i, 0], verts[:, i, 1], verts[:, i, 2], uvs[:, i, 0], uvs[:, i, 1]],
            axis=0,
        )

    s0 = slot(0)
    slots = [s0, slot(1), slot(2), s0]  # closed triangle
    count = jnp.full((P,), 3, jnp.int32)

    slots, count = _clip_polygons(slots, count, voxel_f)
    weight, uv_u, uv_v = _area_uv(slots, count)
    return weight, jnp.stack([uv_u, uv_v], axis=-1)
