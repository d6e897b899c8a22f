"""merge_runs_pallas vs the stable 5-operand lax.sort it replaces.

The kernel's contract (ops/merge_pallas.py): given a buffer of N-aligned
key-sorted runs (INVALID alignment padding included), the output's first P
elements equal `lax.sort((keys,) + chans, num_keys=1, is_stable=True)` of
the input's first P elements -- bit-for-bit, so MAX-strategy tie-breaking
("earliest stream element wins", reference util.hpp:167-172) is preserved
through the merge exactly as with the sort.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obj2voxel_tpu.ops.combine import INVALID_KEY
from obj2voxel_tpu.ops.merge_pallas import (
    _WIN_PAD,
    merge_runs_pallas,
    pick_block,
    plan_runs,
)

INV = (1 << 31) - 1


def _build(rng, counts, n_block, key_hi=1 << 20, p_pad=None):
    """Assemble an aligned-run buffer like the engine's merge assembler."""
    offs, levels, spad = plan_runs(counts, n_block)
    p = offs[-1] if p_pad is None else p_pad
    assert p % n_block == 0
    pb = p + (n_block // 128 + _WIN_PAD) * 128
    keys = np.full(pb, INV, np.int32)
    chans = [np.zeros(pb, np.float32) for _ in range(4)]
    for i, c in enumerate(counts):
        k = np.sort(rng.randint(0, key_hi, c).astype(np.int32))
        keys[offs[i] : offs[i] + c] = k
        for ch in chans:
            ch[offs[i] : offs[i] + c] = rng.rand(c).astype(np.float32)
    # junk in the slack region must never be selected
    keys[p:] = rng.randint(-5, 5, pb - p).astype(np.int32)
    aoff = np.asarray(offs + [p] * (spad + 1 - len(offs)), np.int32)
    return keys, chans, aoff, p, levels, spad


def _check(keys, chans, aoff, p, n_block, levels, spad):
    ok, oc = merge_runs_pallas(
        jnp.asarray(keys),
        tuple(jnp.asarray(c) for c in chans),
        jnp.asarray(aoff),
        p=p,
        n_block=n_block,
        levels=levels,
        spad=spad,
        interpret=True,
    )
    want = jax.lax.sort(
        (jnp.asarray(keys[:p]),) + tuple(jnp.asarray(c[:p]) for c in chans),
        num_keys=1,
        is_stable=True,
    )
    np.testing.assert_array_equal(np.asarray(ok)[:p], np.asarray(want[0]))
    for got, exp in zip(oc, want[1:]):
        np.testing.assert_array_equal(np.asarray(got)[:p], np.asarray(exp))


@pytest.mark.parametrize("s", [1, 2, 3, 5, 8])
def test_random_runs(s):
    rng = np.random.RandomState(s)
    n_block = 1024
    counts = [int(rng.randint(0, 4 * n_block)) for _ in range(s)]
    keys, chans, aoff, p, levels, spad = _build(rng, counts, n_block)
    if p == 0:
        pytest.skip("all-empty draw")
    _check(keys, chans, aoff, p, n_block, levels, spad)


def test_heavy_duplicates_stable():
    """Few distinct keys across many runs: stability is the whole test."""
    rng = np.random.RandomState(7)
    n_block = 1024
    counts = [int(rng.randint(1, 3 * n_block)) for _ in range(6)]
    keys, chans, aoff, p, levels, spad = _build(
        rng, counts, n_block, key_hi=5
    )
    # distinct channel payloads so a stability break changes bytes
    _check(keys, chans, aoff, p, n_block, levels, spad)


def test_empty_and_tiny_runs():
    rng = np.random.RandomState(11)
    n_block = 1024
    counts = [0, 3, 0, 2048, 1, 0, 700]
    keys, chans, aoff, p, levels, spad = _build(rng, counts, n_block)
    _check(keys, chans, aoff, p, n_block, levels, spad)


def test_invalid_tails_in_runs():
    """Runs ending in INVALID rows (compacted pass outputs) sort to the
    global tail."""
    rng = np.random.RandomState(13)
    n_block = 1024
    counts = [1500, 900]
    keys, chans, aoff, p, levels, spad = _build(rng, counts, n_block)
    # overwrite some live rows with INVALID at run tails (still sorted)
    keys[1000:2048] = INV
    _check(keys, chans, aoff, p, n_block, levels, spad)


def test_padded_total():
    """P padded above the aligned total (merge-ladder rung)."""
    rng = np.random.RandomState(17)
    n_block = 1024
    counts = [2000, 1000, 600]
    offs, levels, spad = plan_runs(counts, n_block)
    p_pad = offs[-1] + 2 * n_block
    keys, chans, aoff, p, levels, spad = _build(
        rng, counts, n_block, p_pad=p_pad
    )
    _check(keys, chans, aoff, p, n_block, levels, spad)


def test_pick_block_and_plan():
    assert pick_block(1 << 12) == 1024
    assert pick_block(1 << 23) == 32768
    offs, levels, spad = plan_runs([100, 0, 5000], 1024)
    assert offs == [0, 1024, 1024, 1024 + 5 * 1024]
    assert spad == 4 and levels == 2


@pytest.mark.parametrize("strategy_name", ["max", "blend"])
def test_engine_merge_runs_matches_default(strategy_name, cube_tris, monkeypatch):
    """O2V_MERGE_RUNS=1 (merge-path kernel) == default merge, through the
    engine, both strategies (MAX exercises stability end-to-end)."""
    from conftest import TEST_PAIR_TILE

    from obj2voxel_tpu.constants import BLEND_STRATEGY, MAX_STRATEGY
    from obj2voxel_tpu.engine import TriangleSoup, voxelize_soup

    strategy = MAX_STRATEGY if strategy_name == "max" else BLEND_STRATEGY
    soup = TriangleSoup.from_vertices(cube_tris)

    def run():
        # resolution 128 with the 2^14 test tile forces multi-pass slabs
        # (cube faces bucket at k=14 == the tile), so the merge path runs
        chunks = list(
            voxelize_soup(
                soup, resolution=128, strategy=strategy,
                pair_tile=TEST_PAIR_TILE,
            )
        )
        xyz = np.concatenate([c[0] for c in chunks])
        argb = np.concatenate([c[1] for c in chunks])
        order = np.lexsort((xyz[:, 0], xyz[:, 1], xyz[:, 2]))
        return xyz[order], argb[order]

    monkeypatch.delenv("O2V_MERGE_RUNS", raising=False)
    x0, a0 = run()
    monkeypatch.setenv("O2V_MERGE_RUNS", "1")
    x1, a1 = run()
    np.testing.assert_array_equal(x0, x1)
    np.testing.assert_array_equal(a0, a1)


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
