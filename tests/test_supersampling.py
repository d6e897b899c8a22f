"""Exact 2x2x2 supersampled-downscale tests against numpy oracles.

The reference's own Voxelizer::downscale is broken (it halves the Morton
index instead of each axis coordinate and drops the chunk's voxels,
reference src/voxelization.cpp:538-554); these tests pin the CORRECT
semantics this engine implements instead: per-axis coordinate halving with
the usual weighted combine per output cell (blend = premultiplied sum;
max = strictly-greater weight wins, ties keep the earlier key-sorted entry).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import obj2voxel_tpu.constants as C
from obj2voxel_tpu.engine import TriangleSoup, voxelize_soup
from obj2voxel_tpu.ops.combine import (
    INVALID_KEY,
    downscale_keys,
    merge_combined,
    finalize_colors,
)

from conftest import UNIT_CUBE_QUADS, UNIT_CUBE_VERTICES, quads_to_tris


def test_downscale_keys_exact():
    stride = 8
    x, y, z = np.meshgrid(np.arange(8), np.arange(8), np.arange(8), indexing="ij")
    keys = (x + stride * y + stride * stride * z).ravel().astype(np.int32)
    down = np.asarray(downscale_keys(jnp.asarray(keys), stride))
    s2 = stride // 2
    expect = (x // 2 + s2 * (y // 2) + s2 * s2 * (z // 2)).ravel()
    assert np.array_equal(down, expect)
    # sentinel passes through
    assert int(downscale_keys(jnp.asarray([INVALID_KEY]), stride)[0]) == int(INVALID_KEY)


@pytest.mark.parametrize("is_blend", [True, False])
def test_downscale_merge_numpy_oracle(is_blend):
    """8 samples in one 2x2x2 cell + 2 in another: exact combined values.

    All weights are multiples of 1/8 and colors of 1/4, so float sums are
    exact under any association order.
    """
    stride = 4
    # cell A: samples (0..1)^3 -> output key 0; cell B: x in 2..3 -> key 1
    coords = np.array(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)]
        + [[2, 0, 0], [3, 1, 1]],
        np.int64,
    )
    keys = (coords[:, 0] + stride * coords[:, 1] + stride * stride * coords[:, 2]).astype(np.int32)
    w = np.array([1, 2, 3, 4, 5, 6, 7, 8, 2, 2], np.float32) / 8.0
    rgb = np.stack(
        [
            np.linspace(0, 1, 10).round(2),
            np.full(10, 0.25),
            np.full(10, 0.75),
        ],
        axis=1,
    ).astype(np.float32)
    rgb = (rgb * 4).round() / 4.0  # exact quarters
    vals = np.concatenate([w[:, None], w[:, None] * rgb], axis=1).astype(np.float32)

    dk = downscale_keys(jnp.asarray(keys), stride)
    chans = tuple(jnp.asarray(vals[:, i]) for i in range(4))
    ok, och, oc = merge_combined(dk, chans, is_blend)
    ok, ov, oc = np.asarray(ok), np.stack([np.asarray(c) for c in och], axis=-1), int(oc)

    assert oc == 2
    s2 = stride // 2
    assert list(ok[:2]) == [0, 1]  # cell A key 0, cell B key (x=1) -> 1

    if is_blend:
        expect_a = vals[:8].sum(axis=0)
        expect_b = vals[8:].sum(axis=0)
    else:
        # max weight wins; cell A max w = 1.0 (sample 7), cell B tie at 2/8:
        # ties keep the earlier key-sorted entry = (2,0,0) over (3,1,1)
        expect_a = vals[7]
        expect_b = vals[8]
    np.testing.assert_array_equal(ov[0], expect_a)
    np.testing.assert_array_equal(ov[1], expect_b)

    # finalize recovers rgb = (w*c)/w
    out_rgb = np.stack(
        [np.asarray(c) for c in
         finalize_colors(tuple(jnp.asarray(ov[:2, i]) for i in range(4)))],
        axis=-1,
    )
    np.testing.assert_allclose(out_rgb[0], expect_a[1:] / expect_a[0], rtol=1e-6)


def test_supersampled_cube_positions_exact(pair_tile):
    """Occupancy of (r=8, ss=2) == per-axis halving of (r=16, ss=1)."""
    tris = quads_to_tris(UNIT_CUBE_VERTICES, UNIT_CUBE_QUADS)
    soup = TriangleSoup.from_vertices(tris)

    hi = set()
    for xyz, _ in voxelize_soup(soup, resolution=16, pair_tile=pair_tile):
        hi.update(tuple(v // 2) for v in xyz)
    lo = set()
    for xyz, _ in voxelize_soup(
        soup, resolution=8, supersampling=2, pair_tile=pair_tile
    ):
        lo.update(tuple(v) for v in xyz)
    assert lo == hi


def test_supersampled_flat_color_survives(pair_tile):
    """A flat-colored mesh blends to exactly its color after downscale."""
    tris = quads_to_tris(UNIT_CUBE_VERTICES, UNIT_CUBE_QUADS)
    soup = TriangleSoup.from_vertices(tris)
    soup.types[:] = C.TRI_UNTEXTURED
    soup.rgb[:] = np.array([0.5, 0.25, 1.0], np.float32)

    expected = 0xFF000000 | (0x80 << 16) | (0x40 << 8) | 0xFF
    for xyz, argb in voxelize_soup(
        soup,
        resolution=8,
        supersampling=2,
        strategy=C.BLEND_STRATEGY,
        pair_tile=pair_tile,
    ):
        assert (argb == np.uint32(expected)).all()
