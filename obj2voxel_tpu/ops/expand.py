"""Triangle -> (triangle, voxel) candidate-pair expansion.

The reference walks each triangle's voxel AABB with nested scalar loops
(reference: src/voxelization.cpp:446-448).  On TPU the same iteration space is
materialized as a flat, statically-shaped stream of (triangle_index, voxel)
pairs: an exclusive cumsum over per-triangle AABB volumes gives each triangle a
contiguous range of global pair indices, and each device tile unranks its pair
indices back to (triangle, dx, dy, dz) with a searchsorted + div/mod, mirroring
the reference's x-fastest loop order.
"""

from __future__ import annotations

import jax.numpy as jnp


def triangle_aabbs(verts, resolution, z_lo=0, z_hi=None, g0=None, g1=None):
    """Voxel AABBs of transformed triangles, clamped to the grid / z-slab.

    verts: (N, 3, 3) float32 in voxel-grid space.
    Returns (tmin (N,3) int32, sizes (N,3) int32) with tmin inclusive and
    sizes possibly 0 on any axis for triangles outside the clamp region.

    Matches the reference's voxelMin = floor(min), voxelMax = floor(max) + 1
    exclusive bound (triangle.hpp:91-100) followed by the chunk clamp
    (voxelization.cpp:440-444); out-of-grid geometry is clamped instead of
    relying on unsigned wraparound.
    """
    if z_hi is None:
        z_hi = resolution
    vmin = jnp.floor(jnp.min(verts, axis=1)).astype(jnp.int32)
    vmax = jnp.floor(jnp.max(verts, axis=1)).astype(jnp.int32) + 1
    zero = jnp.int32(0)
    lo = jnp.stack([zero, zero, jnp.asarray(z_lo, jnp.int32)])
    hi = jnp.stack(
        [jnp.asarray(resolution, jnp.int32), jnp.asarray(resolution, jnp.int32),
         jnp.asarray(z_hi, jnp.int32)]
    )
    tmin = jnp.clip(vmin, lo, hi)
    tmax = jnp.clip(vmax, lo, hi)
    sizes = jnp.maximum(tmax - tmin, 0)
    if g0 is not None:
        # restrict to a triangle group [g0, g1): the host splits huge meshes
        # into groups whose total pair count stays below 2^31, keeping all
        # device-side offset arithmetic in native int32 (TPU has no int64)
        idx = jnp.arange(sizes.shape[0], dtype=jnp.int32)
        in_group = (idx >= g0) & (idx < g1)
        sizes = jnp.where(in_group[:, None], sizes, 0)
    return tmin, sizes


def pair_offsets(sizes):
    """Exclusive cumsum of AABB volumes -> (starts (N,) int32, total int32).

    Callers must guarantee the total fits int32 (the engine groups triangles
    on the host so each group's pair total is < 2^30)."""
    counts = sizes[:, 0] * sizes[:, 1] * sizes[:, 2]
    incl = jnp.cumsum(counts)
    starts = incl - counts
    total = incl[-1] if counts.shape[0] else jnp.int32(0)
    return starts, total


def expand_tile(starts, total, tmin, sizes, tile_start, tile_size):
    """Unrank global pair indices [tile_start, tile_start + tile_size).

    Returns (tri (T,) int32, voxel (T,3) int32, valid (T,) bool).
    Loop order matches the reference: x fastest, then y, then z
    (voxelization.cpp:446-448).
    """
    g = jnp.asarray(tile_start, jnp.int32) + jnp.arange(tile_size, dtype=jnp.int32)
    tri = jnp.searchsorted(starts, g, side="right").astype(jnp.int32) - 1
    tri = jnp.clip(tri, 0, starts.shape[0] - 1)
    local = g - starts[tri]
    s = sizes[tri]
    sx = jnp.maximum(s[:, 0], 1)
    sy = jnp.maximum(s[:, 1], 1)
    x = local % sx
    y = (local // sx) % sy
    z = local // (sx * sy)
    voxel = tmin[tri] + jnp.stack([x, y, z], axis=-1)
    valid = g < total
    return tri, voxel, valid
