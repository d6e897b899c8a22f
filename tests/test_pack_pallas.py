"""Tests for the order-preserving stream-compaction kernel (ops/pack_pallas).

The kernel replaces the per-pass compaction sort (ops/combine.compact_channels)
in the fused-pass path; these tests pin (a) the kernel's defined output region
against the NumPy oracle, and (b) bit-identical downstream merges versus the
sort-based compaction it replaces (the property the engine actually relies
on: any order-preserving compaction feeds the slab merge's stable sort the
same stream).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from obj2voxel_tpu.ops.combine import (
    INVALID_KEY,
    compact_channels,
    merge_combined,
)
from obj2voxel_tpu.ops.pack_pallas import (
    BLOCK,
    pack_channels_pallas,
    pack_channels_ref,
    pack_exact_pallas,
    pack_exact_ref,
)

_INV = int(INVALID_KEY)


def _stream(P, live_frac, seed=0, key_range=1 << 28):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, key_range, P).astype(np.int32)
    keys[rng.random(P) > live_frac] = _INV
    chans = tuple(rng.standard_normal(P).astype(np.float32) for _ in range(4))
    # dead slots must carry zero values like the fused kernel emits
    chans = tuple(np.where(keys == _INV, 0.0, c).astype(np.float32) for c in chans)
    return keys, chans


@pytest.mark.parametrize("nblocks,live_frac", [(1, 0.25), (3, 0.25), (2, 0.9)])
def test_pack_matches_oracle(nblocks, live_frac):
    keys, chans = _stream(nblocks * BLOCK, live_frac, seed=nblocks)
    k, ch, cnt = pack_channels_pallas(
        jnp.asarray(keys), tuple(jnp.asarray(c) for c in chans), interpret=True
    )
    rk, rch, rcnt = pack_channels_ref(keys, chans)
    cnt = int(cnt)
    assert cnt == rcnt
    assert cnt % 128 == 0
    np.testing.assert_array_equal(np.asarray(k)[:cnt], rk[:cnt])
    for a, b in zip(ch, rch):
        np.testing.assert_array_equal(np.asarray(a)[:cnt], b[:cnt])


@pytest.mark.parametrize(
    "desc,mk",
    [
        ("all_dead", lambda: np.full(BLOCK, _INV, np.int32)),
        ("all_live", lambda: np.arange(BLOCK, dtype=np.int32)),
        ("one_live", lambda: np.where(
            np.arange(BLOCK) == 5000, 7, _INV).astype(np.int32)),
        ("first_last", lambda: np.where(
            np.isin(np.arange(2 * BLOCK), [0, 2 * BLOCK - 1]), 3, _INV
        ).astype(np.int32)),
    ],
)
def test_pack_edge_cases(desc, mk):
    keys = mk()
    P = keys.shape[0]
    chans = tuple((np.arange(P) + j).astype(np.float32) for j in range(4))
    k, ch, cnt = pack_channels_pallas(
        jnp.asarray(keys), tuple(jnp.asarray(c) for c in chans), interpret=True
    )
    rk, rch, rcnt = pack_channels_ref(keys, chans)
    cnt = int(cnt)
    assert cnt == rcnt
    np.testing.assert_array_equal(np.asarray(k)[:cnt], rk[:cnt])
    for a, b in zip(ch, rch):
        np.testing.assert_array_equal(np.asarray(a)[:cnt], b[:cnt])


def test_pack_preserves_input_order():
    """Live pairs must appear in slot order (the property MAX tie-breaking
    depends on), not key order."""
    keys, chans = _stream(BLOCK, 0.3, seed=42, key_range=50)  # many dup keys
    k, _, cnt = pack_channels_pallas(
        jnp.asarray(keys), tuple(jnp.asarray(c) for c in chans), interpret=True
    )
    live_in_order = keys[keys != _INV]
    got = np.asarray(k)[: int(cnt)]
    np.testing.assert_array_equal(got[got != _INV], live_in_order)


@pytest.mark.parametrize("nblocks,live_frac", [(1, 0.25), (3, 0.37), (2, 0.9)])
def test_pack_exact_matches_oracle(nblocks, live_frac):
    """The EXACT pack (ops/pack_pallas.pack_exact_pallas): dense live prefix
    with no per-block filler slots — live fractions chosen so per-block live
    counts are never 128-aligned, exercising the carry row."""
    keys, chans = _stream(nblocks * BLOCK, live_frac, seed=10 + nblocks)
    k, vs, cnt = pack_exact_pallas(
        jnp.asarray(keys),
        tuple(jnp.asarray(c) for c in chans),
        interpret=True,
    )
    rk, rvs, rcnt = pack_exact_ref(keys, chans)
    cnt = int(cnt)
    assert cnt == rcnt  # exact: every live element, no fillers
    np.testing.assert_array_equal(np.asarray(k)[:cnt], rk[:cnt])
    assert not np.any(np.asarray(k)[:cnt] == _INV)
    for a, b in zip(vs, rvs):
        np.testing.assert_array_equal(np.asarray(a)[:cnt], b[:cnt])


@pytest.mark.parametrize(
    "desc,mk",
    [
        ("all_dead", lambda: np.full(BLOCK, _INV, np.int32)),
        ("all_live", lambda: np.arange(BLOCK, dtype=np.int32)),
        ("one_live", lambda: np.where(
            np.arange(BLOCK) == 5000, 7, _INV).astype(np.int32)),
        ("block_carry", lambda: np.where(
            # 100 live in block 0 then 50 in block 1: the carry row crosses
            # the block boundary twice without ever filling a full row
            (np.arange(2 * BLOCK) % 97 == 0) & (np.arange(2 * BLOCK) < BLOCK + 4850),
            3, _INV).astype(np.int32)),
    ],
)
def test_pack_exact_edge_cases(desc, mk):
    keys = mk()
    P = keys.shape[0]
    vals = (
        (np.arange(P) * 3).astype(np.float32),
        (np.arange(P) + 9).astype(np.uint32),  # uint32 payload (argb bits)
    )
    k, vs, cnt = pack_exact_pallas(
        jnp.asarray(keys), tuple(jnp.asarray(v) for v in vals), interpret=True
    )
    rk, rvs, rcnt = pack_exact_ref(keys, vals)
    cnt = int(cnt)
    assert cnt == rcnt
    np.testing.assert_array_equal(np.asarray(k)[:cnt], rk[:cnt])
    for a, b in zip(vs, rvs):
        np.testing.assert_array_equal(np.asarray(a)[:cnt], b[:cnt])


@pytest.mark.parametrize("is_blend", [False, True])
def test_merge_after_pack_matches_merge_after_sort(is_blend):
    """The engine contract: merging pack output (masked by count, as the
    assembler does) is bit-identical to merging compact_channels output --
    duplicate keys, exact-tie weights and all."""
    P = 2 * BLOCK
    rng = np.random.default_rng(7)
    keys, chans = _stream(P, 0.4, seed=7, key_range=200)  # heavy duplication
    # force exact weight ties among duplicates to exercise MAX tie-breaking
    w = rng.choice(np.float32([0.25, 0.5, 1.0]), P)
    w = np.where(keys == _INV, 0.0, w).astype(np.float32)
    chans = (w,) + tuple(np.where(keys == _INV, 0.0, c * w).astype(np.float32)
                         for c in chans[1:])

    jkeys = jnp.asarray(keys)
    jchans = tuple(jnp.asarray(c) for c in chans)

    pk, pch, pcnt = pack_channels_pallas(jkeys, jchans, interpret=True)
    # mask the undefined tail like engine._make_assembler does
    iota = jnp.arange(P, dtype=jnp.int32)
    pk = jnp.where(iota < pcnt, pk, INVALID_KEY)
    pch = tuple(jnp.where(iota < pcnt, c, 0.0) for c in pch)

    sk, sch, _ = compact_channels(jkeys, jchans)

    mk1, mc1, n1 = merge_combined(pk, pch, jnp.bool_(is_blend))
    mk2, mc2, n2 = merge_combined(sk, sch, jnp.bool_(is_blend))
    n1, n2 = int(n1), int(n2)
    assert n1 == n2
    np.testing.assert_array_equal(np.asarray(mk1)[:n1], np.asarray(mk2)[:n2])
    for a, b in zip(mc1, mc2):
        np.testing.assert_array_equal(np.asarray(a)[:n1], np.asarray(b)[:n2])


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
