"""Per-pair color resolution (material color / texture sampling).

Device-side equivalent of the reference's `VisualTriangle::colorAt_f`
(reference: src/triangle.hpp:181-194): materialless triangles are white,
untextured ones use their flat diffuse color, textured ones sample a texture at
(u, 1 - v) with nearest-pixel lookup and CLAMP/REPEAT wrap modes
(reference: src/io.cpp:456, include/obj2voxel.h:48-50).

Textures of arbitrary sizes are packed into one flat ARGB32 pool so a tile of
pairs resolves every lookup with a single gather.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import UV_CLAMP, TRI_TEXTURED


class TexturePool:
    """Host-side registry packing all textures into one flat pixel pool."""

    def __init__(self):
        self._pixels = []
        self._meta = []
        self._offset = 0

    def add(self, argb: np.ndarray, wrap: int) -> int:
        """argb: (H, W) uint32 image. Returns the texture id."""
        h, w = argb.shape
        self._pixels.append(np.ascontiguousarray(argb.reshape(-1), dtype=np.uint32))
        self._meta.append((self._offset, w, h, wrap))
        self._offset += w * h
        return len(self._meta) - 1

    def set_wrap(self, tex_id: int, wrap: int):
        off, w, h, _ = self._meta[tex_id]
        self._meta[tex_id] = (off, w, h, wrap)

    def __len__(self):
        return len(self._meta)

    def device_arrays(self):
        if not self._meta:
            pixels = np.zeros(1, dtype=np.uint32)
            meta = np.zeros((1, 4), dtype=np.int32)
            meta[0] = (0, 1, 1, UV_CLAMP)
        else:
            pixels = np.concatenate(self._pixels)
            meta = np.asarray(self._meta, dtype=np.int32)
        return pixels, meta


def sample_pair_colors(uv, tri_type, tri_rgb, tri_tex, pool_pixels, pool_meta):
    """Resolve colors for a tile of pairs ((P, 2) UV convenience wrapper)."""
    return sample_pair_colors_uv(
        uv[:, 0], uv[:, 1], tri_type, tri_rgb, tri_tex, pool_pixels, pool_meta
    )


def sample_pair_colors_uv(uv_u, uv_v, tri_type, tri_rgb, tri_tex, pool_pixels, pool_meta):
    """Resolve colors for a tile of pairs.

    uv_u/uv_v: (P,) float32 accumulated UV per pair
    tri_type:  (P,)  int32 triangle material type (TRI_*)
    tri_rgb:   (P, 3) float32 flat color (white for materialless)
    tri_tex:   (P,)  int32 texture id (< 0 when none)
    pool_pixels: (B,) uint32, pool_meta: (T, 4) int32 (offset, w, h, wrap)

    Returns (P, 3) float32 rgb in [0, 1].
    """
    tex = jnp.clip(tri_tex, 0, pool_meta.shape[0] - 1)
    meta = pool_meta[tex]
    off, w, h, wrap = meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3]

    u = uv_u
    v = 1.0 - uv_v  # v-flip at sample time (reference triangle.hpp:190)
    fx = u * w.astype(jnp.float32)
    fy = v * h.astype(jnp.float32)
    ix = jnp.floor(fx).astype(jnp.int32)
    iy = jnp.floor(fy).astype(jnp.int32)

    clamp = wrap == UV_CLAMP
    ix = jnp.where(clamp, jnp.clip(ix, 0, w - 1), jnp.remainder(ix, w))
    iy = jnp.where(clamp, jnp.clip(iy, 0, h - 1), jnp.remainder(iy, h))

    idx = jnp.clip(off + iy * w + ix, 0, pool_pixels.shape[0] - 1)
    px = pool_pixels[idx]
    r = ((px >> 16) & 0xFF).astype(jnp.float32) / 255.0
    g = ((px >> 8) & 0xFF).astype(jnp.float32) / 255.0
    b = (px & 0xFF).astype(jnp.float32) / 255.0
    tex_rgb = jnp.stack([r, g, b], axis=-1)

    use_tex = ((tri_type == TRI_TEXTURED) & (tri_tex >= 0))[:, None]
    return jnp.where(use_tex, tex_rgb, tri_rgb)
