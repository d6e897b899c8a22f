"""Oracle tests for the streaming segmented-combine kernel (interpret mode).

ops/combine.combine_sorted (sort + associative_scan + tail compaction) is the
semantics oracle; the Pallas kernel must reproduce it bit-for-bit on MAX
selection and to float tolerance on blend sums (different reduction trees).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from obj2voxel_tpu.ops.combine import (
    INVALID_KEY,
    combine_sorted,
    premultiply,
    sort_channels,
)
from obj2voxel_tpu.ops.combine_pallas import segment_combine_pallas


def _run_both(keys, w, rgb, is_blend):
    chans = premultiply(jnp.asarray(w), jnp.asarray(rgb))
    sk, sch = sort_channels(jnp.asarray(keys), chans)
    ok, och, oc = combine_sorted(sk, sch, is_blend)
    ov = jnp.stack(och, axis=-1)

    tk, tw, tr, tg, tb = segment_combine_pallas(
        sk, sch[0], sch[1], sch[2], sch[3],
        jnp.bool_(is_blend), interpret=True,
    )
    tk = np.asarray(tk)
    count = int((tk != INVALID_KEY).sum())
    order = np.argsort(tk, kind="stable")
    ck = tk[order][:count]
    cv = np.stack(
        [np.asarray(x)[order][:count] for x in (tw, tr, tg, tb)], axis=-1
    )
    return (np.asarray(ok), np.asarray(ov), int(oc)), (ck, cv, count)


@pytest.mark.parametrize("is_blend", [True, False])
@pytest.mark.parametrize("n_keys", [3, 50, 4096])
def test_kernel_matches_oracle(is_blend, n_keys):
    rng = np.random.RandomState(42)
    P = 4096  # two kernel blocks; n_keys=3 forces runs spanning blocks
    keys = rng.randint(0, n_keys, P).astype(np.int32)
    keys[rng.rand(P) < 0.1] = int(INVALID_KEY)
    w = (rng.rand(P) + 0.01).astype(np.float32)
    w[rng.rand(P) < 0.2] = 0.0  # dead pairs (dropped upstream normally)
    rgb = rng.rand(P, 3).astype(np.float32)
    keys = np.where(w > 0, keys, int(INVALID_KEY)).astype(np.int32)

    (ok, ov, oc), (ck, cv, cc) = _run_both(keys, w, rgb, is_blend)
    assert cc == oc
    assert np.array_equal(ck, ok[:oc])
    np.testing.assert_allclose(cv, ov[:oc], rtol=2e-6, atol=1e-7)


@pytest.mark.parametrize("is_blend", [True, False])
def test_combine_sorted_kernel_pack_path(is_blend):
    """_combine_sorted_kernel at a pack-BLOCK-multiple size routes the tail
    compaction through pack_exact_pallas (round 4); it must reproduce the
    combine_sorted oracle exactly (keys/count; values to blend-sum tolerance)
    INCLUDING the INVALID/zero tail past count that full-buffer consumers
    (merge assembler, downscale re-merge) rely on."""
    from obj2voxel_tpu.ops.combine import _combine_sorted_kernel

    rng = np.random.RandomState(7)
    P = 2 * 8192  # two pack blocks
    keys = rng.randint(0, 600, P).astype(np.int32)
    w = (rng.rand(P) + 0.01).astype(np.float32)
    w[rng.rand(P) < 0.2] = 0.0
    keys = np.where(w > 0, keys, int(INVALID_KEY)).astype(np.int32)
    rgb = rng.rand(P, 3).astype(np.float32)

    chans = premultiply(jnp.asarray(w), jnp.asarray(rgb))
    sk, sch = sort_channels(jnp.asarray(keys), chans)
    ok, och, oc = combine_sorted(sk, sch, is_blend)

    kk, kch, kc = _combine_sorted_kernel(
        sk, sch, jnp.bool_(is_blend), interpret=True
    )
    oc, kc = int(oc), int(kc)
    assert kc == oc
    np.testing.assert_array_equal(np.asarray(kk)[:oc], np.asarray(ok)[:oc])
    # the tail contract: INVALID keys / zero channels past count
    assert np.all(np.asarray(kk)[oc:] == int(INVALID_KEY))
    for a, b in zip(kch, och):
        np.testing.assert_allclose(
            np.asarray(a)[:oc], np.asarray(b)[:oc], rtol=2e-6, atol=1e-7
        )
        assert np.all(np.asarray(a)[oc:] == 0.0)


def test_max_tie_keeps_earliest():
    # two entries with identical weight for the same key: the earlier one
    # (stream order == sorted order via the stable sort) must win
    P = 2048
    keys = np.full(P, int(INVALID_KEY), np.int32)
    w = np.zeros(P, np.float32)
    rgb = np.zeros((P, 3), np.float32)
    keys[0] = keys[1] = 7
    w[0] = w[1] = 0.5
    rgb[0] = [1.0, 0.0, 0.0]
    rgb[1] = [0.0, 1.0, 0.0]

    (ok, ov, oc), (ck, cv, cc) = _run_both(keys, w, rgb, False)
    assert oc == cc == 1
    np.testing.assert_allclose(cv[0], ov[0])
    np.testing.assert_allclose(cv[0, 1:], [0.5, 0.0, 0.0])  # premultiplied red


def test_single_run_spanning_everything():
    P = 4096
    keys = np.zeros(P, np.int32)
    w = np.full(P, 0.25, np.float32)
    rgb = np.tile(np.asarray([[0.2, 0.4, 0.8]], np.float32), (P, 1))
    (ok, ov, oc), (ck, cv, cc) = _run_both(keys, w, rgb, True)
    assert oc == cc == 1
    np.testing.assert_allclose(cv[0], ov[0], rtol=2e-6)
    np.testing.assert_allclose(cv[0, 0], P * 0.25, rtol=1e-5)


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
