"""Pallas TPU kernel for the triangle/voxel clip core.

Wraps the shape-agnostic Sutherland-Hodgman pipeline from `clip.py` in a
`pallas_call` so the entire per-pair computation (polygon slots, plane clips,
area/UV reduction) stays in VMEM/vector registers for a block of pairs instead
of round-tripping ~3000 elementwise intermediates through HBM, and so XLA sees
one custom call instead of a huge fused graph (compile time).

Layout: pairs are channel-major.
  tri_data: (16, P) f32 -- rows 0..8 vertex coords (x0 y0 z0 x1 y1 z1 x2 y2 z2),
            rows 9..14 UVs (u0 v0 u1 v1 u2 v2), row 15 padding.
  vox_data: (4, P) f32 -- rows 0..2 voxel min corner, row 3 padding.
Output:
  out:      (4, P) f32 -- rows: weight, uv_u, uv_v, padding.

P must be a multiple of the block size (engine tiles are pow2 >= 4096).
The pure-jnp `clip_triangles_to_voxels` remains the CPU/interpret oracle
(SURVEY.md section 4: interpreter path as the oracle for TPU kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .clip import _area_uv, _clip_polygons

#: pairs per grid step, laid out (SUB, 128) so every vector op fills all 8
#: VPU sublanes.  Round-1 used (1, 4096)-shaped channels -- one sublane per
#: op, i.e. 1/8 of the VPU -- and measured 8.6 ns/pair.  SUB sweep on the
#: chip: 16 -> 45 ms, 32 -> 6.5 ms, 64 -> 4.9 ms, 128 -> 5.2 ms per 2^21.
SUB = 64
BLOCK = SUB * 128


def _kernel(tri_ref, vox_ref, out_ref):
    t = tri_ref[...]  # (16, SUB, 128) f32
    v = vox_ref[...]  # (4, SUB, 128) f32

    def slot(i):
        # (5, SUB, 128): x, y, z, u, v of vertex i
        return jnp.concatenate(
            [t[3 * i : 3 * i + 3], t[9 + 2 * i : 9 + 2 * i + 2]], axis=0
        )

    s0 = slot(0)
    slots = [s0, slot(1), slot(2), s0]  # closed triangle
    count = jnp.full(t.shape[1:], 3, jnp.int32)
    voxel_f = [v[0], v[1], v[2]]

    slots, count = _clip_polygons(slots, count, voxel_f)
    weight, uv_u, uv_v = _area_uv(slots, count)

    out_ref[...] = jnp.stack(
        [weight, uv_u, uv_v, jnp.zeros_like(weight)], axis=0
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def clip_pairs_pallas(tri_data, vox_data, interpret=False):
    """tri_data (16, P) f32, vox_data (4, P) f32 -> (4, P) f32 (w, u, v, 0)."""
    P = tri_data.shape[1]
    if P % BLOCK:
        pad = BLOCK - P % BLOCK
        tri_data = jnp.pad(tri_data, ((0, 0), (0, pad)))
        vox_data = jnp.pad(vox_data, ((0, 0), (0, pad)))
        return clip_pairs_pallas(tri_data, vox_data, interpret=interpret)[:, :P]
    grid = P // BLOCK

    t3 = tri_data.reshape(16, P // 128, 128)
    v3 = vox_data.reshape(4, P // 128, 128)
    out = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((16, SUB, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, SUB, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4, SUB, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, P // 128, 128), jnp.float32),
        interpret=interpret,
    )(t3, v3)
    return out.reshape(4, P)


def clip_triangles_to_voxels_pallas(verts, uvs, voxel_pos, interpret=False):
    """Drop-in equivalent of clip.clip_triangles_to_voxels via the TPU kernel.

    verts (P,3,3), uvs (P,3,2), voxel_pos (P,3) -> (weight (P,), uv (P,2)).
    """
    P = verts.shape[0]
    tri_data = jnp.concatenate(
        [
            verts.reshape(P, 9).T.astype(jnp.float32),
            uvs.reshape(P, 6).T.astype(jnp.float32),
            jnp.zeros((1, P), jnp.float32),
        ],
        axis=0,
    )
    vox_data = jnp.concatenate(
        [
            voxel_pos.T.astype(jnp.float32),
            jnp.zeros((1, P), jnp.float32),
        ],
        axis=0,
    )
    out = clip_pairs_pallas(tri_data, vox_data, interpret=interpret)
    return out[0], out[1:3].T
