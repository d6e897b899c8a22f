"""On-chip validation of ops/merge_pallas.merge_runs_pallas vs the stable
sort oracle (small sizes; the interpret-mode tests pass but round-5's first
device run produced wrong merge counts -- bisect the real-Mosaic behavior).

Usage: python probes/device_validate_merge.py [log2_total]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from obj2voxel_tpu.ops.merge_pallas import (
    _WIN_PAD, build_aoff, merge_runs_pallas, pick_block, plan_runs,
)

INV = (1 << 31) - 1


def run_case(name, counts, n_block, key_hi, seed=0, pad_rung=False):
    rng = np.random.RandomState(seed)
    offs, levels, spad = plan_runs(counts, n_block)
    p = offs[-1]
    if pad_rung:  # engine pads to a MERGE_LADDER rung above the total
        rung = n_block
        while rung < offs[-1]:
            rung *= 2
        p = max(rung, 2 * n_block)
    if p == 0:
        return True
    pb = p + (n_block // 128 + _WIN_PAD) * 128
    keys = np.full(pb, INV, np.int32)
    chans = [np.zeros(pb, np.float32) for _ in range(4)]
    for i, c in enumerate(counts):
        k = np.sort(rng.randint(0, key_hi, c).astype(np.int32))
        keys[offs[i] : offs[i] + c] = k
        for ch in chans:
            ch[offs[i] : offs[i] + c] = rng.rand(c).astype(np.float32)
    keys[p:] = rng.randint(-5, 5, pb - p).astype(np.int32)
    aoff = build_aoff(offs, spad, p)
    print(f"  [{name}] p={p} n_block={n_block} levels={levels} spad={spad}",
          flush=True)

    ok, oc = merge_runs_pallas(
        jnp.asarray(keys), tuple(jnp.asarray(c) for c in chans),
        jnp.asarray(aoff), p=p, n_block=n_block, levels=levels, spad=spad,
    )
    want = jax.lax.sort(
        (jnp.asarray(keys[:p]),) + tuple(jnp.asarray(c[:p]) for c in chans),
        num_keys=1, is_stable=True,
    )
    good = np.array_equal(np.asarray(ok)[:p], np.asarray(want[0]))
    for got, exp in zip(oc, want[1:]):
        good &= np.array_equal(np.asarray(got)[:p], np.asarray(exp))
    if not good:
        gk = np.asarray(ok)[:p]
        wk = np.asarray(want[0])
        bad = np.nonzero(gk != wk)[0]
        print(f"  first mismatches at {bad[:8]} of {p}; got {gk[bad[:4]]} want {wk[bad[:4]]}")
        srt = np.all(np.diff(gk) >= 0)
        print(f"  output sorted: {srt}; got[:8]={gk[:8]} want[:8]={wk[:8]}")
    print(f"{name:40s} {'PASS' if good else 'FAIL'}")
    return good


def main():
    cases = [
        ("two runs n=1024", [1500, 900], 1024, 1 << 20),
        ("single run", [3000], 1024, 1 << 20),
        ("heavy dups", [2000, 2000, 1000, 500], 1024, 7),
        ("empty+tiny", [0, 3, 0, 2048, 1, 0, 700], 1024, 1 << 20),
        ("eight runs", [int(x) for x in
                        np.random.RandomState(1).randint(0, 4096, 8)],
         1024, 1 << 20),
        ("n=8192 blocks", [30000, 22000, 5000], 8192, 1 << 24),
    ]
    ok = all(run_case(*c) for c in cases)
    # engine-scale shapes: n_block=32768, 11 runs (spad 16 / levels 4),
    # rung-padded totals, slab-realistic key range
    rng = np.random.RandomState(9)
    eng = [
        ("engine-ish 11 runs nb=32768 rung-pad",
         [int(x) for x in rng.randint(0, 900000, 11)], 32768, 1 << 28),
        ("engine-ish 3 runs nb=32768 rung-pad",
         [800000, 123456, 45000], 32768, 1 << 28),
    ]
    for name, counts, nb, hi in eng:
        ok &= run_case(name, counts, nb, hi, seed=11, pad_rung=True)
    print("ALL PASS" if ok else "FAILURES")


if __name__ == "__main__":
    main()
