"""Fused-pass kernel (ops/pass_fused.py) vs the XLA pass pipeline.

The fused Pallas kernel (in-kernel one-hot expansion + clip + key +
premultiply) must reproduce engine._bucket_pass's XLA pipeline: same voxel
set (keys/xyz bit-exact) and the same weights/colors up to a few ulps.  Full
bit-exactness across the two programs is NOT attainable on CPU: XLA's CPU
codegen contracts mul+add chains differently at different array shapes, so
even the pure-jnp clip gives 1-ulp-different areas at (16, P) vs
(16, P/128, 128) (measured: 152/2048 weights differ by <= 2.4e-7, amplified to ~1.5e-5
relative by cancellation in sliver-polygon areas).  Keys are
integer/compare-only and stay exact, and ARGB bytes agree because colors are
weight RATIOS (the divergence cancels).  Runs in interpret mode on CPU
(SURVEY.md section 4: interpreter path as the oracle);
scripts/device_validate.py repeats the comparison on the real chip.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from obj2voxel_tpu.engine import _bucket_pass, build_tri_table, pass_scalars


BUDGET = 1 << 14  # 2 kernel blocks


def _table(n, res, aabb_span, seed=0):
    rng = np.random.RandomState(seed)
    verts = rng.uniform(1, res - 1 - aabb_span, size=(n, 3, 3)).astype(np.float32)
    verts[:, 1:, :] = verts[:, :1, :] + rng.uniform(
        -aabb_span, aabb_span, size=(n, 2, 3)
    ).astype(np.float32)
    uvs = rng.uniform(0, 1, size=(n, 3, 2)).astype(np.float32)
    types = np.full(n, 1, np.int32)
    rgb = rng.rand(n, 3).astype(np.float32)
    tex = np.full(n, -1, np.int32)
    t = build_tri_table(verts, uvs, types, rgb, tex)
    return jnp.asarray(np.ascontiguousarray(t.T))


def _run(tableT, expand, n_rows, is_blend, fused, ref_weights=False):
    pixels = jnp.zeros(1, jnp.uint32)
    meta = jnp.zeros((1, 4), jnp.int32)
    res = 64
    keys, chans, xyz, argb, count = _bucket_pass(
        tableT, pixels, meta,
        pass_scalars(0, n_rows, 0, 0, res, res, is_blend, False),
        expand=expand, budget=BUDGET, use_pallas=False,
        ref_weights=ref_weights, fused=fused,
    )
    c = int(count)
    return (
        np.asarray(keys[:c]),
        np.stack([np.asarray(ch[:c]) for ch in chans], axis=-1),
        np.asarray(xyz[:c]),
        np.asarray(argb[:c]),
    )


# expand spans all kernel layout paths: lane one-hot (2, 8), expand==1
# passthrough, expand==128 sublane broadcast, sublane one-hot (512),
# expand==BLOCK (8192) and expand>BLOCK (16384, multiple blocks per row)
@pytest.mark.parametrize("expand", [1, 2, 8, 128, 512, 8192, 16384])
@pytest.mark.parametrize("is_blend", [False, True])
def test_fused_matches_xla_pipeline(expand, is_blend):
    span = {1: 0.6, 2: 0.7, 8: 1.2, 128: 3.5, 512: 6.0, 8192: 15.0,
            16384: 20.0}[expand]
    R = BUDGET // expand
    n = max(R + 8, 16)  # a few rows beyond n_rows exercise dead-row masking
    tableT = _table(n, 64, span, seed=expand)
    n_rows = max(R - 1, 1)

    k0, v0, xyz0, argb0 = _run(tableT, expand, n_rows, is_blend, fused=False)
    k1, v1, xyz1, argb1 = _run(tableT, expand, n_rows, is_blend, fused=True)

    assert k0.shape == k1.shape
    np.testing.assert_array_equal(k0, k1)
    np.testing.assert_array_equal(xyz0, xyz1)
    np.testing.assert_allclose(v0, v1, rtol=5e-5, atol=1e-5)
    # ARGB bytes agree except where the CPU codegen divergence lands a
    # quotient exactly on a .5 rounding boundary: allow +-1 in <0.1% of
    # bytes (on the device both paths are bit-exact -- see
    # probes/device_validate_r3.log, max dv 0.00e+00)
    b0 = argb0.view(np.uint8).astype(np.int16)
    b1 = argb1.view(np.uint8).astype(np.int16)
    diff = np.abs(b0 - b1)
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 1e-3
    assert k0.size > 0  # the comparison actually covered voxels


def test_fused_ref_weights_mode():
    tableT = _table(1 << 12, 64, 1.2, seed=3)
    k0, v0, *_ = _run(tableT, 8, (1 << 11) - 3, False, fused=False,
                      ref_weights=True)
    k1, v1, *_ = _run(tableT, 8, (1 << 11) - 3, False, fused=True,
                      ref_weights=True)
    np.testing.assert_array_equal(k0, k1)
    np.testing.assert_allclose(v0, v1, rtol=5e-6, atol=1e-6)


@pytest.mark.parametrize("expand", [8, 512])
def test_batched_pass_matches_single(expand):
    """_bucket_pass_batch == per-pass _bucket_pass(fused=True, finalize=False).

    Keys/counts must be bit-exact (integer math); channels to float tolerance
    (XLA CPU contracts mul+add chains differently at (1, ...) vs (B, ...)
    shapes -- same ulp-level divergence as the fused-vs-XLA comparison above;
    probes/profile_batch.py repeats this on the real chip)."""
    from obj2voxel_tpu.engine import _bucket_pass_batch

    B = 4
    R = BUDGET // expand
    span = {8: 1.2, 512: 6.0}[expand]
    tableT = _table(B * R + 32, 64, span, seed=100 + expand)
    pixels = jnp.zeros(1, jnp.uint32)
    meta = jnp.zeros((1, 4), jnp.int32)
    res = 64

    # B passes over different row windows and z slabs (z windows exercise the
    # per-pass clamp; rows outside a window die via vol=0)
    r0s = np.arange(B, dtype=np.int32) * R
    n_rows = np.array([R, R - 5, R, R - 1], np.int32)
    local_bases = np.zeros(B, np.int32)
    z_los = np.array([0, 16, 32, 48], np.int32)
    z_his = np.array([16, 32, 48, 64], np.int32)

    bk, bchans, bcounts = _bucket_pass_batch(
        tableT,
        jnp.asarray(r0s), jnp.asarray(n_rows), jnp.asarray(local_bases),
        jnp.asarray(z_los), jnp.asarray(z_his), jnp.int32(res),
        expand=expand, budget=BUDGET, nbatch=B, use_pallas=False,
    )
    bk = np.asarray(bk)
    bcounts = np.asarray(bcounts)
    bchans = [np.asarray(c) for c in bchans]

    covered = 0
    for b in range(B):
        keys, chans, _, _, count = _bucket_pass(
            tableT, pixels, meta,
            pass_scalars(r0s[b], n_rows[b], 0, z_los[b], z_his[b], res,
                         False, False),
            expand=expand, budget=BUDGET, use_pallas=False,
            fused=True, finalize=False,
        )
        assert int(count) == int(bcounts[b])
        np.testing.assert_array_equal(np.asarray(keys), bk[b])
        for ch, bc in zip(chans, bchans):
            np.testing.assert_allclose(
                np.asarray(ch), bc[b], rtol=5e-5, atol=1e-5
            )
        covered += int(count)
    assert covered > 0


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
