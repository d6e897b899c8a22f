"""Vectorized triangle/voxel-cube clipping.

This is the TPU-native reformulation of the reference's recursive triangle
splitting (reference: src/voxelization.cpp:175-331, 383-424).  Instead of
maintaining dynamic triangle lists and a case analysis per splitting plane, we
clip each (triangle, voxel) pair's polygon with a branch-free, fixed-capacity
Sutherland-Hodgman pass over the voxel's six planes, batched over a whole tile
of pairs at once.

Epsilon/bias semantics
----------------------
The reference classifies vertices per plane as `lo` (v < plane), `planar`
(|v - plane| < EPSILON) and routes planar geometry to the *hi* side
(IS_LO_BIASED = false, reference voxelization.cpp:108-127, 192-237).  For pure
occupancy/area purposes that case analysis is equivalent to clipping against a
half-open, epsilon-shifted box:

* keep-hi clip at plane p (reference DISCARD_LO):  inside  <=>  v > p - EPSILON
* keep-lo clip at plane p (reference DISCARD_HI):  inside  <=>  v <= p - EPSILON

so a triangle lying exactly on a voxel boundary plane belongs to the voxel on
the +side of that plane, exactly like the reference.  Pieces that survive the
reference's routing but have zero area (slivers on a boundary) get zero weight
here and are dropped, which again matches the observable output (the reference
drops zero-weight UV entries, voxelization.cpp:466-467).

Weighting
---------
The reference weights each surviving piece with the *whole input triangle's*
area (voxelization.cpp:416-417), making the final per-voxel weight
`area * piece_count` with a decomposition-dependent piece count.  We instead use
the clipped polygon's actual area as the weight and its area-weighted UV
centroid -- the behavior the reference's README documents (README.adoc:287-290)
and a decomposition-independent, better-defined quantity.  Occupancy (weight>0)
is identical; blended colors are equivalent up to the reference's
piece-count quirk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import EPSILON


def _ring_next(count, capacity):
    """Index of each slot's successor in a ring of `count` valid slots."""
    idx = jnp.arange(capacity, dtype=jnp.int32)
    nxt = idx + 1
    return jnp.where(nxt[None, :] >= count[:, None], 0, nxt[None, :])


def _clip_one_plane(pos, uv, count, axis, plane, keep_hi):
    """One Sutherland-Hodgman clipping pass for a batch of polygons.

    pos:   (P, C, 3) float32 polygon vertices
    uv:    (P, C, 2) float32 per-vertex UVs
    count: (P,)      int32   number of valid vertices per polygon
    axis:  python int in [0, 3)
    plane: (P,) float32 plane offset
    keep_hi: python bool -- True keeps the +side (reference DISCARD_LO).

    Returns (pos', uv', count') with capacity C+1.
    """
    P, C = pos.shape[0], pos.shape[1]
    cout = C + 1

    idx = jnp.arange(C, dtype=jnp.int32)
    valid = idx[None, :] < count[:, None]  # (P, C)
    nxt = _ring_next(count, C)  # (P, C)

    v = pos[:, :, axis]  # (P, C)
    p = plane[:, None]
    # The reference's case analysis routes a polygon whose vertices are ALL
    # strictly lo (v < plane) entirely to the lo side, even when some/all of
    # them are also within EPSILON of the plane (splitTriangle cases (3,*),
    # reference voxelization.cpp:201-205).  The per-vertex epsilon rule alone
    # would misclassify those, so the all-lo case bypasses it.
    all_lo = jnp.all((v < p) | ~valid, axis=1, keepdims=True)
    if keep_hi:
        inside = ((p - v) < EPSILON) & ~all_lo  # v > p - EPS, unless all-lo
    else:
        inside = all_lo | ((v < p) & ((p - v) >= EPSILON))  # v <= p - EPS

    take = functools.partial(jnp.take_along_axis, axis=1)
    inside_nxt = take(inside, nxt)
    pos_nxt = take(pos, nxt[:, :, None])
    uv_nxt = take(uv, nxt[:, :, None])
    v_nxt = pos_nxt[:, :, axis]

    crossing = inside != inside_nxt
    emit_cur = inside & valid
    emit_isect = crossing & valid

    # Edge/plane intersection parameter, matching the reference's
    # intersect_ray_axisPlane (voxelization.cpp:27-31): d = v - v_nxt,
    # t = 0 when |d| < EPSILON else (v - plane) / d; point = mix(cur, nxt, t).
    d = v - v_nxt
    t = jnp.where(jnp.abs(d) < EPSILON, 0.0, (v - p) / jnp.where(d == 0, 1.0, d))
    t3 = t[:, :, None]
    isect_pos = (1.0 - t3) * pos + t3 * pos_nxt
    isect_uv = (1.0 - t3) * uv + t3 * uv_nxt

    # Output slot for each emission: exclusive prefix sum of emission counts.
    counts = emit_cur.astype(jnp.int32) + emit_isect.astype(jnp.int32)
    incl = jnp.cumsum(counts, axis=1)
    offs = incl - counts  # exclusive
    dest_cur = offs
    dest_isect = offs + emit_cur.astype(jnp.int32)
    new_count = incl[:, -1]

    # Scatter via one-hot contraction (branch-free; small static dims).
    slots = jnp.arange(cout, dtype=jnp.int32)
    oh_cur = ((dest_cur[:, :, None] == slots[None, None, :]) & emit_cur[:, :, None]).astype(
        pos.dtype
    )
    oh_isect = (
        (dest_isect[:, :, None] == slots[None, None, :]) & emit_isect[:, :, None]
    ).astype(pos.dtype)

    # precision=HIGHEST keeps the contraction in f32: coordinates are exact
    # inputs here, and the default (bf16) matmul path would round them.
    ee = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
    out_pos = ee("pcs,pcd->psd", oh_cur, pos) + ee("pcs,pcd->psd", oh_isect, isect_pos)
    out_uv = ee("pcs,pcd->psd", oh_cur, uv) + ee("pcs,pcd->psd", oh_isect, isect_uv)
    return out_pos, out_uv, new_count


def clip_triangles_to_voxels(verts, uvs, voxel_pos):
    """Clip each triangle against its voxel's cube; return (weight, uv).

    verts:     (P, 3, 3) float32 triangle vertices in voxel-grid space
    uvs:       (P, 3, 2) float32 per-vertex texture coordinates
    voxel_pos: (P, 3)    int32/float32 voxel minimum corner

    Returns:
      weight: (P,) float32 -- clipped polygon area; 0 where the triangle does
              not occupy the voxel under the reference's epsilon rules.
      uv:     (P, 2) float32 -- area-weighted UV centroid of the clipped region.

    Plane order matches the reference (voxelization.cpp:388-405): first the
    keep-hi clips at pos[axis] for axes x,y,z, then the keep-lo clips at
    pos[axis]+1.
    """
    vox = voxel_pos.astype(jnp.float32)
    pos = verts.astype(jnp.float32)
    uv = uvs.astype(jnp.float32)
    count = jnp.full((pos.shape[0],), 3, dtype=jnp.int32)

    for hi in (False, True):
        for axis in range(3):
            plane = vox[:, axis] + (1.0 if hi else 0.0)
            pos, uv, count = _clip_one_plane(pos, uv, count, axis, plane, keep_hi=not hi)

    return polygon_area_uv(pos, uv, count)


def polygon_area_uv(pos, uv, count):
    """Area + area-weighted UV centroid of planar polygons via a triangle fan.

    pos: (P, C, 3), uv: (P, C, 2), count: (P,).  Fan pieces (0, i, i+1) for
    i in [1, count-1).  Degenerate polygons (count < 3) get zero area.
    """
    C = pos.shape[1]
    e = pos - pos[:, :1, :]  # edges from vertex 0
    # cross(e_i, e_{i+1}) for i = 1..C-2
    a = e[:, 1 : C - 1, :]
    b = e[:, 2:C, :]
    cr = jnp.cross(a, b)
    i = jnp.arange(1, C - 1, dtype=jnp.int32)
    piece_valid = (i[None, :] + 1) < count[:, None]
    piece_area = 0.5 * jnp.linalg.norm(cr, axis=-1) * piece_valid.astype(pos.dtype)

    uv0 = uv[:, :1, :]
    piece_uv = (uv0 + uv[:, 1 : C - 1, :] + uv[:, 2:C, :]) / 3.0

    weight = jnp.sum(piece_area, axis=1)
    uv_num = jnp.sum(piece_area[:, :, None] * piece_uv, axis=1)
    safe_w = jnp.where(weight > 0, weight, 1.0)
    uv_out = uv_num / safe_w[:, None]
    return weight, uv_out
