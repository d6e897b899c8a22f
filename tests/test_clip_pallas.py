"""Pallas clip kernel vs the pure-jnp oracle (interpret mode on CPU).

This is the serial-vs-parallel oracle pattern the reference relies on
(SURVEY.md section 4): the jnp implementation is the ground truth for the TPU
kernel."""

import pytest
import jax.numpy as jnp
import numpy as np

from obj2voxel_tpu.ops.clip import clip_triangles_to_voxels
from obj2voxel_tpu.ops.clip_pallas import clip_triangles_to_voxels_pallas


def test_pallas_matches_jnp_oracle():
    rng = np.random.RandomState(7)
    P = 256
    verts = rng.uniform(0, 8, size=(P, 3, 3)).astype(np.float32)
    uvs = rng.uniform(0, 1, size=(P, 3, 2)).astype(np.float32)
    voxels = rng.randint(0, 8, size=(P, 3)).astype(np.int32)

    w_ref, uv_ref = clip_triangles_to_voxels(
        jnp.asarray(verts), jnp.asarray(uvs), jnp.asarray(voxels)
    )
    w_pal, uv_pal = clip_triangles_to_voxels_pallas(
        jnp.asarray(verts), jnp.asarray(uvs), jnp.asarray(voxels), interpret=True
    )

    w_p = np.asarray(w_pal)
    w_r = np.asarray(w_ref)
    # the two implementations run the same math in different op orders, so
    # knife-edge slivers may differ in the last ulp; compare with an absolute
    # floor well below any real clipped area (voxel areas are O(1))
    np.testing.assert_allclose(w_p, w_r, rtol=1e-4, atol=1e-6)
    occupied = w_r > 1e-6
    assert np.array_equal(occupied, w_p > 1e-6)
    np.testing.assert_allclose(
        np.asarray(uv_pal)[occupied], np.asarray(uv_ref)[occupied], rtol=1e-4, atol=1e-5
    )
    assert occupied.sum() > 10  # the fixture actually exercises occupancy


def test_pallas_boundary_semantics():
    # plane exactly on a voxel boundary belongs to the hi voxel, like the oracle
    tri = np.array([[[6.0, 5.2, 5.2], [6.0, 5.8, 5.2], [6.0, 5.2, 5.8]]], np.float32)
    tri = np.repeat(tri, 8, axis=0)  # pad to a lane-friendly batch
    uv = np.zeros((8, 3, 2), np.float32)
    vox_hi = np.tile(np.array([[6, 5, 5]], np.int32), (8, 1))
    vox_lo = np.tile(np.array([[5, 5, 5]], np.int32), (8, 1))
    w_hi, _ = clip_triangles_to_voxels_pallas(
        jnp.asarray(tri), jnp.asarray(uv), jnp.asarray(vox_hi), interpret=True
    )
    w_lo, _ = clip_triangles_to_voxels_pallas(
        jnp.asarray(tri), jnp.asarray(uv), jnp.asarray(vox_lo), interpret=True
    )
    assert float(w_hi[0]) > 0
    assert float(w_lo[0]) == 0.0


@pytest.fixture(autouse=True, scope="module")
def _fresh_compile_state():
    """Drop all live jitted executables before this module compiles its big
    Pallas programs: XLA's CPU backend segfaulted inside
    backend_compile_and_load when these compiles ran ~65% into the full
    suite with GBs of accumulated JITed modules, while the same compile in
    a fresh process succeeds (round-5 suite logs).  Freeing compile state
    first keeps the trigger away; the cost is re-JITting shared small
    programs once per heavy module."""
    import gc

    import jax as _jax

    _jax.clear_caches()
    gc.collect()
    yield
