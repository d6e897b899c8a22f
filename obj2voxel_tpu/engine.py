"""Host-side voxelization pipeline driver.

TPU-native replacement for the reference's engine/orchestrator
(reference: src/obj2voxel.cpp:467-520): the stage-barrier worker pipeline
(bounds -> transform -> sort-into-chunks -> voxelize-chunks) becomes

  bounds reduce -> device triangle transform -> flat pair expansion ->
  fused slab passes (tile loop -> clip -> color -> sort + segmented combine
  -> optional 2x downscale -> finalize) -> compacted voxel stream

Each z-slab executes as ONE device program (a fori_loop over pair tiles
filling a raw pair buffer, then a single sort+combine): host<->device round
trips are two per slab (a count pull and a data pull), which matters because
the transport link has ~30 ms latency.  Slabs keep voxel keys within int32
and stream the output in z order with bounded memory, the property the
reference gets from 64^3 chunking (README.adoc:272-278).
"""

from __future__ import annotations

import dataclasses
import functools
import os as _os

import jax

# The slab kernels are compiled once per (budget, tile) size; persist the
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

from .constants import BLEND_STRATEGY, MAX_STRATEGY, PAIR_TILE, TRI_MATERIALLESS
from .geometry import compute_mesh_transform, mesh_bounds
from .ops.clip import clip_triangles_to_voxels
from .ops.clip_pallas import clip_triangles_to_voxels_pallas
from .ops.color import TexturePool, sample_pair_colors
from .ops.combine import (
    INVALID_KEY,
    combine_pairs,
    downscale_keys,
    finalize_colors,
    merge_combined,
    pack_argb,
    premultiply,
    sort_pairs,
)
from .ops.expand import expand_tile, pair_offsets, triangle_aabbs
from .ops.subdivide import subdivide_soup

#: Maximum pairs materialized per device pass (raw buffer ~20 B/pair).
MAX_PASS_BUDGET = 1 << 25

#: Allowed pass-buffer sizes.  Each distinct size costs one (cached) XLA
#: compile of the fused slab kernel, so the ladder is deliberately coarse.
BUDGET_LADDER = (1 << 18, 1 << 21, 1 << 23, 1 << 25)


def _ladder_budget(n: int, pair_tile: int, max_budget: int) -> int:
    for b in BUDGET_LADDER:
        if b >= n and b >= pair_tile and b <= max_budget:
            return b
    return min(max_budget, BUDGET_LADDER[-1])


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

    @staticmethod
    def from_simple_mesh(vertices, quads: bool = False) -> "TriangleSoup":
        """Raw (M*3,) or (M, 3) float vertex list of triangles or quads
        (reference ITriangleStream::fromSimpleMesh, io.cpp:82-116; quads split
        as (0,1,2) + (1,2,3) like the reference's strip-style emission)."""
        v = np.asarray(vertices, np.float32).reshape(-1, 3)
        per = 4 if quads else 3
        assert v.shape[0] % per == 0
        prims = v.reshape(-1, per, 3)
        if quads:
            tris = np.concatenate(
                [prims[:, [0, 1, 2]], prims[:, [0, 2, 3]]], axis=1
            ).reshape(-1, 3, 3)
        else:
            tris = prims
        return TriangleSoup.from_vertices(np.ascontiguousarray(tris))

    @staticmethod
    def from_indexed_mesh(vertices, elements, quads: bool = False) -> "TriangleSoup":
        """Indexed triangle/quad mesh (reference
        ITriangleStream::fromIndexedMesh, io.cpp:118-161)."""
        v = np.asarray(vertices, np.float32).reshape(-1, 3)
        e = np.asarray(elements, np.int64).reshape(-1, 4 if quads else 3)
        if quads:
            idx = np.concatenate([e[:, [0, 1, 2]], e[:, [0, 2, 3]]], axis=1).reshape(
                -1, 3
            )
        else:
            idx = e
        return TriangleSoup.from_vertices(np.ascontiguousarray(v[idx]))

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


@jax.jit
def _transform_verts(verts, matrix, translation):
    # Row-by-row dot products in full f32 (no bf16 matmul path): vertex
    # coordinates must be exact to preserve the reference's floor/epsilon
    # semantics.
    out = jnp.einsum(
        "ntd,rd->ntr", verts, matrix, precision=jax.lax.Precision.HIGHEST
    )
    return (out + translation).astype(jnp.float32)


@jax.jit
def _device_aabbs(verts_t, resolution, z_lo, z_hi, g0, g1):
    tmin, sizes = triangle_aabbs(verts_t, resolution, z_lo, z_hi, g0, g1)
    starts, total = pair_offsets(sizes)
    return tmin, sizes, starts, total


@functools.partial(jax.jit, static_argnames=("budget", "tile", "use_pallas"))
def _slab_pass(
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
    pass_start,
    z_lo,
    stride,
    is_blend,
    do_downscale,
    *,
    budget,
    tile,
    use_pallas,
):
    """One fused pass: fill `budget` raw pairs starting at global pair index
    `pass_start`, then combine.  Returns (keys, vals, xyz, argb, count)."""
    n_tiles = budget // tile

    raw_key = jnp.full((budget,), INVALID_KEY, jnp.int32)
    raw_w = jnp.zeros((budget,), jnp.float32)
    raw_rgb = jnp.zeros((budget, 3), jnp.float32)

    def body(i, carry):
        rk, rw, rc = carry
        tile_start = pass_start + i * tile
        tri, voxel, valid = expand_tile(starts, total, tmin, sizes, tile_start, tile)
        if use_pallas:
            w, uv = clip_triangles_to_voxels_pallas(verts_t[tri], uvs[tri], voxel)
        else:
            w, uv = clip_triangles_to_voxels(verts_t[tri], uvs[tri], voxel)
        w = jnp.where(valid, w, 0.0)
        colors = sample_pair_colors(uv, types[tri], rgb[tri], tex[tri], pixels, meta)
        key = (voxel[:, 2] - z_lo) * (stride * stride) + voxel[:, 1] * stride + voxel[:, 0]
        key = jnp.where(w > 0, key.astype(jnp.int32), INVALID_KEY)
        off = i * tile
        rk = jax.lax.dynamic_update_slice(rk, key, (off,))
        rw = jax.lax.dynamic_update_slice(rw, w.astype(jnp.float32), (off,))
        rc = jax.lax.dynamic_update_slice(rc, colors.astype(jnp.float32), (off, 0))
        return rk, rw, rc

    raw_key, raw_w, raw_rgb = jax.lax.fori_loop(
        0, n_tiles, body, (raw_key, raw_w, raw_rgb)
    )

    keys, vals, count = combine_pairs(raw_key, raw_w, raw_rgb, is_blend)

    def down(args):
        k, v, _ = args
        dk = downscale_keys(k, stride)
        return merge_combined(dk, v, is_blend)

    keys, vals, count = jax.lax.cond(
        do_downscale, down, lambda a: a, (keys, vals, count)
    )

    out_stride = jnp.where(do_downscale, stride // 2, stride)
    z_base = jnp.where(do_downscale, z_lo // 2, z_lo)
    x = keys % out_stride
    y = (keys // out_stride) % out_stride
    z = keys // (out_stride * out_stride) + z_base
    xyz = jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
    argb = pack_argb(finalize_colors(vals))
    return keys, vals, xyz, argb, count


@functools.partial(jax.jit, static_argnames=("budget",))
def _merge_pass(keys, vals, z_lo, stride, is_blend, do_downscale, *, budget):
    """Merge concatenated per-pass compacted outputs and finalize."""
    def down(args):
        k, v = args
        return downscale_keys(k, stride), v

    keys, vals = jax.lax.cond(do_downscale, down, lambda a: a, (keys, vals))
    keys, vals, count = merge_combined(keys, vals, is_blend)

    out_stride = jnp.where(do_downscale, stride // 2, stride)
    z_base = jnp.where(do_downscale, z_lo // 2, z_lo)
    x = keys % out_stride
    y = (keys // out_stride) % out_stride
    z = keys // (out_stride * out_stride) + z_base
    xyz = jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
    argb = pack_argb(finalize_colors(vals))
    return xyz, argb, count


# --- pipeline --------------------------------------------------------------


def slab_plan(stride: int, z_extent: int | None = None):
    """Split the grid into z-slabs whose local keys fit in int32.

    Slab heights are even so supersampled downscaling never crosses a slab.
    z_extent defaults to stride (cubical grid); batched dataset-gen stacks
    meshes along z, giving a taller extent.
    """
    r = stride
    if z_extent is None:
        z_extent = r
    max_cells = 2**31 - 2
    h = max(2, min(z_extent, max_cells // (r * r)))
    if h % 2 and h > 1:
        h -= 1
    if r > 1 and h < 2:
        raise ValueError(f"Resolution {r} too large for int32 slab keys")
    slabs = []
    z = 0
    while z < z_extent:
        slabs.append((z, min(z + h, z_extent)))
        z += h
    return slabs


def _pull(arr, count, pow2_min=1 << 10):
    """Pull the first `count` rows, padding the device slice to a pow2 ladder
    so only O(log) slice programs ever compile."""
    if count == 0:
        return np.zeros((0,) + arr.shape[1:], arr.dtype)
    padded = _pow2_at_least(count, pow2_min)
    padded = min(padded, arr.shape[0])
    return np.asarray(arr[:padded])[:count]


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
    max_pass_budget: int = MAX_PASS_BUDGET,
    subdivide: bool = True,
):
    """Voxelize a triangle soup; yields (xyz int32 (K,3), argb uint32 (K)) per slab.

    Mirrors obj2voxel_voxelize's compute core (reference obj2voxel.cpp:578-637)
    minus I/O: caller streams the yielded voxel batches into a sink.
    """
    n = len(soup)
    if n == 0:
        return

    sample_res = resolution * supersampling
    is_blend = bool(strategy == BLEND_STRATEGY)
    do_down = bool(supersampling > 1)

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

    # Transform on host (cheap affine, float32 like the reference) so the
    # subdivision work-regularizer can run in voxel space before upload.
    verts_host = transform.apply(soup.verts)
    if subdivide:
        verts_host, uvs_host, tri_index = subdivide_soup(verts_host, soup.uvs)
        types_host = soup.types[tri_index]
        rgb_host = soup.rgb[tri_index]
        tex_host = soup.tex[tri_index]
    else:
        uvs_host, types_host, rgb_host, tex_host = (
            soup.uvs, soup.types, soup.rgb, soup.tex,
        )

    from .io import debug_stl

    if debug_stl.enabled():
        debug_stl.record(verts_host)

    yield from voxelize_grid(
        verts_host,
        uvs_host,
        types_host,
        rgb_host,
        tex_host,
        pixels,
        meta,
        stride=sample_res,
        z_extent=sample_res,
        is_blend=is_blend,
        do_down=do_down,
        pair_tile=pair_tile,
        max_pass_budget=max_pass_budget,
    )


def voxelize_grid(
    verts_host,
    uvs_host,
    types_host,
    rgb_host,
    tex_host,
    pixels,
    meta,
    *,
    stride: int,
    z_extent: int,
    is_blend: bool,
    do_down: bool,
    pair_tile: int = PAIR_TILE,
    max_pass_budget: int = MAX_PASS_BUDGET,
):
    """Core streaming loop over z-slabs for pre-transformed triangles.

    The grid spans [0, stride) in x/y and [0, z_extent) in z (batched
    dataset-gen stacks meshes along z)."""
    n_sub = verts_host.shape[0]
    if n_sub == 0:
        return
    sample_res = stride

    # Host-side triangle grouping: contiguous ranges whose full-grid pair
    # total stays below 2^30 so all device offset math fits int32.
    clamp_hi = np.array([stride, stride, z_extent], np.float32)
    vmin_h = np.clip(np.floor(verts_host.min(axis=1)), 0, clamp_hi)
    vmax_h = np.clip(np.floor(verts_host.max(axis=1)) + 1, 0, clamp_hi)
    size_h = np.maximum(vmax_h - vmin_h, 0).astype(np.int64)
    counts_h = size_h[:, 0] * size_h[:, 1] * size_h[:, 2]
    GROUP_LIMIT = 1 << 30
    csum = np.cumsum(counts_h)
    if n_sub == 0 or csum[-1] < GROUP_LIMIT:
        groups = [(0, n_sub)]
    else:
        bounds = [0]
        while bounds[-1] < n_sub:
            base = csum[bounds[-1] - 1] if bounds[-1] > 0 else 0
            nxt = int(np.searchsorted(csum, base + GROUP_LIMIT))
            nxt = max(nxt, bounds[-1] + 1)  # always make progress
            bounds.append(min(nxt, n_sub))
        groups = list(zip(bounds[:-1], bounds[1:]))

    n_pad = _pow2_at_least(n_sub)
    verts, uvs, types, rgb, tex = _pad_tris(
        [verts_host, uvs_host, types_host, rgb_host, tex_host], n_pad
    )
    verts_t = jnp.asarray(verts)
    uvs = jnp.asarray(uvs)
    types = jnp.asarray(types)
    rgb = jnp.asarray(rgb)
    tex = jnp.asarray(tex)

    for z_lo, z_hi in slab_plan(sample_res, z_extent):
        pass_outputs = []

        def group_aabbs(g0, g1):
            return _device_aabbs(
                verts_t,
                jnp.int32(sample_res),
                jnp.int32(z_lo),
                jnp.int32(z_hi),
                jnp.int32(g0),
                jnp.int32(g1),
            )

        # decide up front whether this slab needs the merge path (several
        # passes whose voxel sets may overlap)
        totals = []
        for g0, g1 in groups:
            if len(groups) == 1:
                tmin, sizes, starts, total_dev = group_aabbs(g0, g1)
                totals.append(int(total_dev))
            else:
                totals.append(int(group_aabbs(g0, g1)[3]))
        multi = sum(-(-t // max_pass_budget) for t in totals) > 1

        for (g0, g1), total in zip(groups, totals):
            if total == 0:
                continue
            if len(groups) > 1:
                tmin, sizes, starts, _ = group_aabbs(g0, g1)

            n_passes = -(-total // max_pass_budget)
            for p in range(n_passes):
                pass_start = p * max_pass_budget
                pass_pairs = min(max_pass_budget, total - pass_start)
                budget = _ladder_budget(pass_pairs, pair_tile, max_pass_budget)
                tile = min(pair_tile, budget)
                keys, vals, xyz, argb, count = _slab_pass(
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
                    jnp.int32(total),
                    jnp.int32(pass_start),
                    jnp.int32(z_lo),
                    jnp.int32(sample_res),
                    jnp.bool_(is_blend),
                    # with several passes downscaling must wait for the merge
                    jnp.bool_(do_down and not multi),
                    budget=budget,
                    tile=tile,
                    use_pallas=jax.default_backend() != "cpu",
                )
                count = int(count)
                if count == 0:
                    continue
                if not multi:
                    yield _pull(xyz, count), _pull(argb, count)
                else:
                    pass_outputs.append((_pull(keys, count), _pull(vals, count)))

        if multi and pass_outputs:
            all_k = np.concatenate([k for k, _ in pass_outputs])
            all_v = np.concatenate([v for _, v in pass_outputs])
            m_pad = _pow2_at_least(all_k.shape[0])
            pad = m_pad - all_k.shape[0]
            if pad:
                all_k = np.concatenate([all_k, np.full(pad, np.int32(2**31 - 1))])
                all_v = np.concatenate(
                    [all_v, np.zeros((pad, all_v.shape[1]), all_v.dtype)]
                )
            xyz, argb, count = _merge_pass(
                jnp.asarray(all_k),
                jnp.asarray(all_v),
                jnp.int32(z_lo),
                jnp.int32(sample_res),
                jnp.bool_(is_blend),
                jnp.bool_(do_down),
                budget=m_pad,
            )
            count = int(count)
            if count:
                yield _pull(xyz, count), _pull(argb, count)


def voxelize_batch(
    soups,
    pool: TexturePool | None = None,
    *,
    resolution: int,
    supersampling: int = 1,
    strategy: int = MAX_STRATEGY,
    pair_tile: int = PAIR_TILE,
    max_pass_budget: int = MAX_PASS_BUDGET,
):
    """Voxelize many small meshes in one device pipeline (3D-ML dataset-gen).

    Each mesh is independently normalized to its own [0, r)^3 grid, then all
    meshes are stacked along z (mesh i occupies z in [i*r_s, (i+1)*r_s)) so a
    single pair stream / sort covers the whole batch -- the TPU-native answer
    to "voxelize 1k meshes in parallel".  Returns a list of (xyz, argb) per
    mesh, each in that mesh's own coordinate system.
    """
    sample_res = resolution * supersampling
    is_blend = bool(strategy == BLEND_STRATEGY)
    do_down = bool(supersampling > 1)

    if pool is None:
        pool = TexturePool()
    pixels_np, meta_np = pool.device_arrays()
    pixels = jnp.asarray(pixels_np)
    meta = jnp.asarray(meta_np)

    all_v, all_u, all_t, all_c, all_x = [], [], [], [], []
    for i, soup in enumerate(soups):
        if len(soup) == 0:
            continue
        mesh_min, mesh_max = mesh_bounds(soup.verts)
        transform = compute_mesh_transform(mesh_min, mesh_max, sample_res)
        v = transform.apply(soup.verts)
        v, u, tri_index = subdivide_soup(v, soup.uvs)
        v = v.copy()
        v[:, :, 2] += np.float32(i * sample_res)  # stack along z
        all_v.append(v)
        all_u.append(u)
        all_t.append(soup.types[tri_index])
        all_c.append(soup.rgb[tri_index])
        all_x.append(soup.tex[tri_index])

    results = [
        (np.zeros((0, 3), np.int32), np.zeros((0,), np.uint32)) for _ in soups
    ]
    if not all_v:
        return results

    out_res = resolution
    per_mesh_extent = sample_res // supersampling if do_down else sample_res
    for xyz, argb in voxelize_grid(
        np.concatenate(all_v),
        np.concatenate(all_u),
        np.concatenate(all_t),
        np.concatenate(all_c),
        np.concatenate(all_x),
        pixels,
        meta,
        stride=sample_res,
        z_extent=len(soups) * sample_res,
        is_blend=is_blend,
        do_down=do_down,
        pair_tile=pair_tile,
        max_pass_budget=max_pass_budget,
    ):
        mesh_id = xyz[:, 2] // per_mesh_extent
        local = xyz.copy()
        local[:, 2] = xyz[:, 2] % per_mesh_extent
        for m in np.unique(mesh_id):
            sel = mesh_id == m
            old_xyz, old_argb = results[int(m)]
            results[int(m)] = (
                np.concatenate([old_xyz, local[sel]]),
                np.concatenate([old_argb, argb[sel]]),
            )
    del out_res
    return results


def densify(xyz: np.ndarray, argb: np.ndarray, resolution: int) -> np.ndarray:
    """Sparse voxel list -> dense (r, r, r) uint32 ARGB grid (0 = empty)."""
    grid = np.zeros((resolution,) * 3, np.uint32)
    if xyz.shape[0]:
        grid[xyz[:, 0], xyz[:, 1], xyz[:, 2]] = argb
    return grid
