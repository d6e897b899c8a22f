"""Host-side voxelization pipeline driver.

TPU-native replacement for the reference's engine/orchestrator
(reference: src/obj2voxel.cpp:467-520): the stage-barrier worker pipeline
(bounds -> transform -> sort-into-chunks -> voxelize-chunks) becomes

  bounds reduce -> device triangle transform -> flat pair expansion ->
  tiled clip kernel -> sort + segmented combine -> (optional 2x downscale) ->
  compacted voxel stream

with z-slab streaming replacing 64^3 chunk scheduling: each slab's voxel keys
fit in int32 and slabs are disjoint in z, so output streams slab by slab and
memory stays bounded at high resolutions (the property advertised in the
reference README.adoc:272-278).
"""

from __future__ import annotations

import dataclasses
import functools

import os as _os

import jax

# int64 is required for pair-offset arithmetic (total candidate pairs can
# exceed 2^31); all performance-relevant arrays stay explicitly 32-bit.
jax.config.update("jax_enable_x64", True)

# The tile kernels are compiled once per (tile size, strategy); persist the
# executables so CLI invocations after the first skip the multi-minute XLA
# compile.
_cache_dir = _os.environ.get(
    "O2V_COMPILE_CACHE", _os.path.expanduser("~/.cache/obj2voxel_tpu_xla")
)
if _cache_dir and _cache_dir != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - older jax without these flags
        pass

import jax.numpy as jnp
import numpy as np

from .constants import (
    BLEND_STRATEGY,
    MAX_STRATEGY,
    PAIR_TILE,
    TRI_MATERIALLESS,
)
from .geometry import compute_mesh_transform, mesh_bounds
from .ops.clip import clip_triangles_to_voxels
from .ops.color import TexturePool, sample_pair_colors
from .ops.combine import (
    INVALID_KEY,
    combine_pairs,
    combine_sorted,
    finalize_colors,
    pack_argb,
    sort_pairs,
)
from .ops.expand import expand_tile, pair_offsets, triangle_aabbs


@dataclasses.dataclass
class TriangleSoup:
    """Flat triangle arrays, the device-friendly mesh representation."""

    verts: np.ndarray  # (N, 3, 3) float32
    uvs: np.ndarray  # (N, 3, 2) float32
    types: np.ndarray  # (N,) int32 (TRI_*)
    rgb: np.ndarray  # (N, 3) float32 flat colors (white for materialless)
    tex: np.ndarray  # (N,) int32 texture ids, -1 if none

    @staticmethod
    def empty() -> "TriangleSoup":
        return TriangleSoup(
            np.zeros((0, 3, 3), np.float32),
            np.zeros((0, 3, 2), np.float32),
            np.zeros((0,), np.int32),
            np.zeros((0, 3), np.float32),
            np.full((0,), -1, np.int32),
        )

    @staticmethod
    def from_vertices(verts: np.ndarray) -> "TriangleSoup":
        n = verts.shape[0]
        return TriangleSoup(
            np.asarray(verts, np.float32),
            np.zeros((n, 3, 2), np.float32),
            np.full((n,), TRI_MATERIALLESS, np.int32),
            np.ones((n, 3), np.float32),
            np.full((n,), -1, np.int32),
        )

    def __len__(self):
        return self.verts.shape[0]


def _pow2_at_least(n: int, minimum: int = 256) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


def _pad_tris(arrays, n_pad):
    out = []
    for a in arrays:
        pad = n_pad - a.shape[0]
        if pad:
            a = np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])
        out.append(a)
    return out


# --- jitted device stages --------------------------------------------------


@functools.partial(jax.jit, donate_argnums=())
def _transform_verts(verts, matrix, translation):
    # Row-by-row dot products in full f32 (no bf16 matmul path): vertex
    # coordinates must be exact to preserve the reference's floor/epsilon
    # semantics.
    out = jnp.einsum(
        "ntd,rd->ntr", verts, matrix, precision=jax.lax.Precision.HIGHEST
    )
    return (out + translation).astype(jnp.float32)


@jax.jit
def _device_aabbs(verts_t, resolution, z_lo, z_hi):
    tmin, sizes = triangle_aabbs(verts_t, resolution, z_lo, z_hi)
    starts, total = pair_offsets(sizes)
    return tmin, sizes, starts, total


@functools.partial(jax.jit, static_argnames=("tile_size", "strategy"))
def _voxelize_tile(
    verts_t,
    uvs,
    types,
    rgb,
    tex,
    pixels,
    meta,
    tmin,
    sizes,
    starts,
    total,
    tile_start,
    z_lo,
    stride,
    *,
    tile_size,
    strategy,
):
    """One tile of pairs: expand -> clip -> color -> combine."""
    tri, voxel, valid = expand_tile(starts, total, tmin, sizes, tile_start, tile_size)

    tv = verts_t[tri]
    tuv = uvs[tri]
    weight, uv = clip_triangles_to_voxels(tv, tuv, voxel)
    weight = jnp.where(valid, weight, 0.0)

    colors = sample_pair_colors(uv, types[tri], rgb[tri], tex[tri], pixels, meta)

    key = (voxel[:, 2] - z_lo) * (stride * stride) + voxel[:, 1] * stride + voxel[:, 0]
    key = key.astype(jnp.int32)
    return combine_pairs(key, weight, colors, strategy)


@functools.partial(jax.jit, static_argnames=("strategy",))
def _merge_tiles(keys, vals, strategy):
    sorted_keys, (svals,) = sort_pairs(keys, (vals,))
    return combine_sorted(sorted_keys, svals, strategy)


@functools.partial(jax.jit, static_argnames=("strategy",))
def _downscale(keys, vals, stride, strategy):
    """Correct per-axis 2x2x2 downscale of slab-local keys + re-combine."""
    s2 = stride // 2
    x = keys % stride
    y = (keys // stride) % stride
    zl = keys // (stride * stride)
    down = (zl // 2) * (s2 * s2) + (y // 2) * s2 + (x // 2)
    down = jnp.where(keys == INVALID_KEY, INVALID_KEY, down)
    sorted_keys, (svals,) = sort_pairs(down.astype(jnp.int32), (vals,))
    return combine_sorted(sorted_keys, svals, strategy)


@functools.partial(jax.jit, static_argnames=("strategy",))
def _finalize(keys, vals, z_base, stride, strategy):
    x = keys % stride
    y = (keys // stride) % stride
    z = keys // (stride * stride) + z_base
    xyz = jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
    rgb = finalize_colors(vals, strategy)
    argb = pack_argb(rgb)
    return xyz, argb


# --- pipeline --------------------------------------------------------------


def slab_plan(sample_resolution: int):
    """Split the grid into z-slabs whose local keys fit in int32.

    Slab heights are even so supersampled downscaling never crosses a slab.
    """
    r = sample_resolution
    max_cells = 2**31 - 2
    h = max(2, min(r, max_cells // (r * r)))
    if h % 2:
        h -= 1
    if h <= 0:
        raise ValueError(f"Resolution {r} too large for int32 slab keys")
    slabs = []
    z = 0
    while z < r:
        slabs.append((z, min(z + h, r)))
        z += h
    return slabs


def voxelize_soup(
    soup: TriangleSoup,
    pool: TexturePool | None = None,
    *,
    resolution: int,
    supersampling: int = 1,
    strategy: int = MAX_STRATEGY,
    unit_transform=None,
    bounds=None,
    pair_tile: int = PAIR_TILE,
):
    """Voxelize a triangle soup; yields (xyz int32 (K,3), argb uint32 (K)) per slab.

    Mirrors obj2voxel_voxelize's compute core (reference obj2voxel.cpp:578-637)
    minus I/O: caller streams the yielded voxel batches into a sink.
    """
    n = len(soup)
    if n == 0:
        return

    sample_res = resolution * supersampling

    if bounds is None:
        mesh_min, mesh_max = mesh_bounds(soup.verts)
    else:
        mesh_min = np.asarray(bounds[0], np.float32)
        mesh_max = np.asarray(bounds[1], np.float32)
    transform = compute_mesh_transform(mesh_min, mesh_max, sample_res, unit_transform)

    if pool is None:
        pool = TexturePool()
    pixels_np, meta_np = pool.device_arrays()
    pixels = jnp.asarray(pixels_np)
    meta = jnp.asarray(meta_np)

    n_pad = _pow2_at_least(n)
    verts, uvs, types, rgb, tex = _pad_tris(
        [soup.verts, soup.uvs, soup.types, soup.rgb, soup.tex], n_pad
    )
    verts_t = _transform_verts(
        jnp.asarray(verts), jnp.asarray(transform.matrix), jnp.asarray(transform.translation)
    )
    uvs = jnp.asarray(uvs)
    types = jnp.asarray(types)
    rgb = jnp.asarray(rgb)
    tex = jnp.asarray(tex)

    slabs = slab_plan(sample_res)

    for z_lo, z_hi in slabs:
        tmin, sizes, starts, total = _device_aabbs(
            verts_t, jnp.int32(sample_res), jnp.int32(z_lo), jnp.int32(z_hi)
        )
        total = int(total)
        if total == 0:
            continue

        n_tiles = -(-total // pair_tile)
        parts_k, parts_v = [], []
        single_tile = None
        for tile_start in range(0, total, pair_tile):
            k, v, c = _voxelize_tile(
                verts_t,
                uvs,
                types,
                rgb,
                tex,
                pixels,
                meta,
                tmin,
                sizes,
                starts,
                jnp.int64(total),
                jnp.int64(tile_start),
                jnp.int32(z_lo),
                jnp.int32(sample_res),
                tile_size=pair_tile,
                strategy=strategy,
            )
            if n_tiles == 1:
                # keep full-tile padded arrays on device: static shapes mean
                # one compile serves every slab and resolution
                single_tile = (k, v, int(c))
                break
            c = int(c)
            if c:
                parts_k.append(np.asarray(k)[:c])
                parts_v.append(np.asarray(v)[:c])

        if single_tile is not None:
            keys, vals, count = single_tile
            if count == 0:
                continue
        elif not parts_k:
            continue
        else:
            all_k = np.concatenate(parts_k)
            all_v = np.concatenate(parts_v)
            m_pad = _pow2_at_least(all_k.shape[0])
            pad = m_pad - all_k.shape[0]
            if pad:
                all_k = np.concatenate([all_k, np.full(pad, np.int32(2**31 - 1))])
                all_v = np.concatenate([all_v, np.zeros((pad, all_v.shape[1]), all_v.dtype)])
            keys, vals, count = _merge_tiles(jnp.asarray(all_k), jnp.asarray(all_v), strategy)
            count = int(count)

        out_stride = sample_res
        z_base = z_lo
        if supersampling > 1:
            keys, vals, count = _downscale(keys, vals, jnp.int32(sample_res), strategy)
            count = int(count)
            out_stride = sample_res // 2
            z_base = z_lo // 2

        xyz, argb = _finalize(
            keys, vals, jnp.int32(z_base), jnp.int32(out_stride), strategy
        )
        xyz = np.asarray(xyz)[:count]
        argb = np.asarray(argb)[:count]
        if count:
            yield xyz, argb
