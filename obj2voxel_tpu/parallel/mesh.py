"""Multi-chip voxelization: spatial data parallelism over a device mesh.

TPU-native replacement for the reference's worker-pool chunk parallelism
(reference: src/obj2voxel.cpp:254-314, threading.hpp): the voxel grid is
sharded into z-slabs across devices on a 1-D `jax.sharding.Mesh`; triangles
are replicated (they are small relative to pair work) and each device
expands/clips/combines only the pairs that fall in its slab.  Because slabs
are disjoint in z and the combine is associative, no inter-chip communication
is needed for the voxel data itself -- the only collective is a `psum` of the
per-device voxel counts, which rides ICI (SURVEY.md section 2.4's mapping).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import BLEND_STRATEGY, MAX_STRATEGY
from ..geometry import compute_mesh_transform, mesh_bounds
from ..ops.clip import clip_triangles_to_voxels
from ..ops.color import TexturePool, sample_pair_colors
from ..ops.combine import combine_pairs, finalize_colors, pack_argb
from ..ops.expand import expand_tile, pair_offsets, triangle_aabbs


def _per_device_voxelize(
    verts_t, uvs, types, rgb, tex, pixels, meta, *, resolution, slab_h, tile_size, strategy
):
    """Voxelize this device's z-slab.  Runs inside shard_map."""
    idx = jax.lax.axis_index("z")
    z_lo = (idx * slab_h).astype(jnp.int32)
    z_hi = jnp.minimum(z_lo + slab_h, resolution)

    tmin, sizes = triangle_aabbs(verts_t, resolution, z_lo, z_hi)
    starts, total = pair_offsets(sizes)
    total = jnp.minimum(total, tile_size)  # dryrun-scale: one tile per device

    tri, voxel, valid = expand_tile(starts, total, tmin, sizes, 0, tile_size)
    weight, uv = clip_triangles_to_voxels(verts_t[tri], uvs[tri], voxel)
    weight = jnp.where(valid, weight, 0.0)
    colors = sample_pair_colors(uv, types[tri], rgb[tri], tex[tri], pixels, meta)

    stride = jnp.int32(resolution)
    key = (voxel[:, 2] - z_lo) * (stride * stride) + voxel[:, 1] * stride + voxel[:, 0]
    keys, vals, count = combine_pairs(
        key.astype(jnp.int32), weight, colors, strategy == BLEND_STRATEGY
    )

    total_count = jax.lax.psum(count, "z")
    return keys[None], vals[None], count[None], z_lo[None], total_count[None]


def make_sharded_voxelizer(
    n_devices: int | None = None,
    *,
    resolution: int,
    tile_size: int = 1 << 14,
    strategy: int = MAX_STRATEGY,
    devices=None,
):
    """Build a jitted, mesh-sharded voxelize step.

    Returns (fn, mesh) where fn(verts_t, uvs, types, rgb, tex, pixels, meta)
    -> (keys (D, T), vals (D, T, 4), counts (D,), z_los (D,), total (D,)).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    mesh = Mesh(devices, ("z",))
    slab_h = -(-resolution // n_devices)
    if slab_h % 2 and n_devices > 1:
        slab_h += 1  # even slabs keep 2x downscale slab-local

    kernel = functools.partial(
        _per_device_voxelize,
        resolution=resolution,
        slab_h=slab_h,
        tile_size=tile_size,
        strategy=strategy,
    )

    fn = jax.jit(
        jax.shard_map(
            kernel,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P("z"), P("z"), P("z"), P("z"), P("z")),
        )
    )
    return fn, mesh


def voxelize_sharded(
    soup,
    pool: TexturePool | None = None,
    *,
    resolution: int,
    strategy: int = MAX_STRATEGY,
    n_devices: int | None = None,
    tile_size: int = 1 << 14,
):
    """Run a mesh-sharded voxelization; returns (xyz (K,3) int32, argb-ready
    vals (K,4) float32, strategy) aggregated across devices.

    Intended for moderate-size meshes that fit one pair tile per device slab;
    the streaming single-device engine handles everything else this round.
    """

    @jax.jit
    def _finalize(keys, vals, z_base, stride):
        x = keys % stride
        y = (keys // stride) % stride
        z = keys // (stride * stride) + z_base
        xyz = jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
        argb = pack_argb(finalize_colors(vals))
        return xyz, argb

    n = len(soup)
    if n == 0:
        return np.zeros((0, 3), np.int32), np.zeros((0,), np.uint32)

    mesh_min, mesh_max = mesh_bounds(soup.verts)
    transform = compute_mesh_transform(mesh_min, mesh_max, resolution)
    verts_t = transform.apply(soup.verts)

    if pool is None:
        pool = TexturePool()
    pixels, meta = pool.device_arrays()

    fn, mesh = make_sharded_voxelizer(
        n_devices, resolution=resolution, tile_size=tile_size, strategy=strategy
    )
    keys, vals, counts, z_los, _total = fn(
        jnp.asarray(verts_t),
        jnp.asarray(soup.uvs),
        jnp.asarray(soup.types),
        jnp.asarray(soup.rgb),
        jnp.asarray(soup.tex),
        jnp.asarray(pixels),
        jnp.asarray(meta),
    )

    keys = np.asarray(keys)
    vals = np.asarray(vals)
    counts = np.asarray(counts)
    z_los = np.asarray(z_los)

    out_xyz, out_argb = [], []
    for d in range(keys.shape[0]):
        c = int(counts[d])
        if not c:
            continue
        xyz, argb = _finalize(
            jnp.asarray(keys[d]),
            jnp.asarray(vals[d]),
            jnp.int32(z_los[d]),
            jnp.int32(resolution),
        )
        out_xyz.append(np.asarray(xyz)[:c])
        out_argb.append(np.asarray(argb)[:c])
    if not out_xyz:
        return np.zeros((0, 3), np.int32), np.zeros((0,), np.uint32)
    return np.concatenate(out_xyz), np.concatenate(out_argb)
