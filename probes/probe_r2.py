"""Round-2 design probes on the real TPU.

Measures the primitives the fused-pass redesign depends on:
  1. XLA row-gather throughput (the per-slab bucket-order gather).
  2. Mosaic in-kernel expansion options: broadcast+reshape, jnp.repeat,
     one-hot matmul (sublane expand), pltpu.roll, in-kernel minor reshape,
     dynamic in-kernel gather.
  3. Sort variants at 2^21: (key, iota)+val gather vs multi-operand sort.
  4. Current epilogue pieces: associative scan, nonzero compaction.

Timing method per CLAUDE.md: the relay adds ~30 ms per host pull and
block_until_ready is unreliable, so every measurement runs the op `inner`
times chained inside one jit and pulls a scalar; t_op = (t_total - t_base)/inner
where t_base is measured with inner=0-ish (a trivial program).
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def pull_scalar(x):
    return float(np.asarray(jax.device_get(x)))


def time_call(fn, *args, reps=3):
    """Time fn(*args) -> scalar pull, return best-of wall seconds."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        pull_scalar(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    t0 = time.perf_counter()
    devs = jax.devices()
    report("devices", n=len(devs), kind=str(devs[0]), claim_s=round(time.perf_counter() - t0, 1))

    # --- baseline pull latency -------------------------------------------
    @jax.jit
    def trivial(x):
        return x + 1.0

    z = jnp.float32(0.0)
    trivial(z)
    base = time_call(trivial, z, reps=5)
    report("baseline_pull", ms=round(base * 1e3, 2))

    INNER = 16

    def chained(op, make_variant):
        """Build a jit that runs op INNER times with data dependencies."""

        @jax.jit
        def run(*args):
            def body(i, acc):
                out = op(i, *args)
                return acc + out
            return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

        return run

    # --- 1. XLA row gather -----------------------------------------------
    N_TAB = 1 << 22
    N_IDX = 1 << 21
    table = jnp.asarray(np.random.rand(N_TAB, 32).astype(np.float32))
    # bucket-sorted-ish indices: ascending with duplicates
    idx_np = np.sort(np.random.randint(0, N_TAB, size=N_IDX)).astype(np.int32)
    idx = jnp.asarray(idx_np)

    def gather_op(i, table, idx):
        g = table[(idx + i) % N_TAB]
        return g[0, 0] + g[-1, -1]

    run = chained(gather_op, None)
    run(table, idx)  # compile
    t = (time_call(run, table, idx) - base) / INNER
    gbps = N_IDX * 32 * 4 / t / 1e9
    report("xla_row_gather_32f32", ms=round(t * 1e3, 3), GBps=round(gbps, 1))

    # random (non-sorted) indices
    idx_r = jnp.asarray(np.random.randint(0, N_TAB, size=N_IDX).astype(np.int32))
    t = (time_call(run, table, idx_r) - base) / INNER
    report("xla_row_gather_random", ms=round(t * 1e3, 3),
           GBps=round(N_IDX * 32 * 4 / t / 1e9, 1))

    # transposed gather: (32, N) take along lanes
    table_t = table.T

    def gather_t_op(i, table_t, idx):
        g = jnp.take(table_t, (idx + i) % N_TAB, axis=1)
        return g[0, 0] + g[-1, -1]

    run_t = chained(gather_t_op, None)
    try:
        run_t(table_t, idx)
        t = (time_call(run_t, table_t, idx) - base) / INNER
        report("xla_col_gather_32f32", ms=round(t * 1e3, 3),
               GBps=round(N_IDX * 32 * 4 / t / 1e9, 1))
    except Exception as e:
        report("xla_col_gather_32f32", error=str(e)[:200])

    # --- 2. Mosaic kernel probes ------------------------------------------
    S, L = 64, 128
    E = 8
    R = L // E

    x_small = jnp.asarray(np.arange(S * R, dtype=np.float32).reshape(S, R))

    def probe_kernel(name, kernel, in_shape, out_shape, check=None):
        try:
            fn = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            arg = jnp.asarray(
                np.arange(np.prod(in_shape), dtype=np.float32).reshape(in_shape)
            )
            out = np.asarray(jax.jit(fn)(arg))
            ok = True if check is None else check(np.asarray(arg), out)
            report(name, ok=bool(ok))
        except Exception as e:
            report(name, error=str(e)[:300])

    # 2a. lane-expand via broadcast + reshape
    def k_bcast_reshape(x_ref, o_ref):
        x = x_ref[...]  # (S, R)
        y = jnp.broadcast_to(x[:, :, None], (S, R, E)).reshape(S, R * E)
        o_ref[...] = y

    probe_kernel(
        "mosaic_bcast_reshape_lane", k_bcast_reshape, (S, R), (S, L),
        check=lambda a, o: np.array_equal(o, np.repeat(a, E, axis=1)),
    )

    # 2b. jnp.repeat lane
    def k_repeat_lane(x_ref, o_ref):
        o_ref[...] = jnp.repeat(x_ref[...], E, axis=1)

    probe_kernel(
        "mosaic_jnp_repeat_lane", k_repeat_lane, (S, R), (S, L),
        check=lambda a, o: np.array_equal(o, np.repeat(a, E, axis=1)),
    )

    # 2c. jnp.repeat sublane
    def k_repeat_sub(x_ref, o_ref):
        o_ref[...] = jnp.repeat(x_ref[...], E, axis=0)

    probe_kernel(
        "mosaic_jnp_repeat_sublane", k_repeat_sub, (R, L), (R * E, L),
        check=lambda a, o: np.array_equal(o, np.repeat(a, E, axis=0)),
    )

    # 2d. one-hot matmul sublane expand (the fallback plan)
    def k_onehot_expand(x_ref, o_ref):
        x = x_ref[...]  # (Sr, L) rows
        s_ids = jax.lax.broadcasted_iota(jnp.int32, (S, S // E), 0)
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (S, S // E), 1)
        M = ((s_ids // E) == r_ids).astype(jnp.float32)  # (S, Sr)
        o_ref[...] = jax.lax.dot_general(
            M, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    probe_kernel(
        "mosaic_onehot_matmul_expand", k_onehot_expand, (S // E, L), (S, L),
        check=lambda a, o: np.array_equal(o, np.repeat(a, E, axis=0)),
    )

    # 2e. pltpu.roll along lanes
    def k_roll(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 1, 1)

    probe_kernel(
        "mosaic_roll_lane", k_roll, (S, L), (S, L),
        check=lambda a, o: np.array_equal(o, np.roll(a, 1, axis=1)),
    )

    # 2f. in-kernel minor reshape (R,32)->(S',L)
    def k_reshape(x_ref, o_ref):
        x = x_ref[...]  # (256, 32)
        o_ref[...] = x.reshape(64, 128)

    probe_kernel(
        "mosaic_minor_reshape", k_reshape, (256, 32), (64, 128),
        check=lambda a, o: np.array_equal(o, a.reshape(64, 128)),
    )

    # 2g. dynamic in-kernel gather along sublanes
    def k_gather(x_ref, o_ref):
        x = x_ref[...]  # (S, L)
        ids = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0) // E
        o_ref[...] = jnp.take_along_axis(x, ids, axis=0)

    probe_kernel(
        "mosaic_take_along_sublane", k_gather, (S, L), (S, L),
        check=lambda a, o: np.array_equal(o, a[np.arange(S) // E]),
    )

    # 2h. dynamic lane shift (x >> k with traced k)
    def k_dynshift(x_ref, o_ref):
        xi = x_ref[...].astype(jnp.int32)
        k = xi[0, 0]
        o_ref[...] = (xi >> k).astype(jnp.float32)

    probe_kernel("mosaic_dynamic_shift", k_dynshift, (S, L), (S, L))

    # --- 3. sorts at 2^21 ---------------------------------------------------
    P = 1 << 21
    keys = jnp.asarray(np.random.randint(0, 1 << 30, size=P).astype(np.int32))
    vals = jnp.asarray(np.random.rand(P, 4).astype(np.float32))
    v4 = [jnp.asarray(np.random.rand(P).astype(np.float32)) for _ in range(4)]

    def sort_gather_op(i, keys, vals):
        k2 = keys + i
        iota = jax.lax.broadcasted_iota(jnp.int32, (P,), 0)
        sk, perm = jax.lax.sort((k2, iota), num_keys=1, is_stable=True)
        sv = vals[perm]
        return sk[0].astype(jnp.float32) + sv[0, 0]

    run_sg = chained(sort_gather_op, None)
    run_sg(keys, vals)
    t = (time_call(run_sg, keys, vals) - base) / INNER
    report("sort_iota_then_gather_2e21", ms=round(t * 1e3, 2))

    def sort_multi_op(i, keys, a, b, c, d):
        k2 = keys + i
        out = jax.lax.sort((k2, a, b, c, d), num_keys=1, is_stable=True)
        return out[0][0].astype(jnp.float32) + out[1][0]

    run_sm = chained(sort_multi_op, None)
    run_sm(keys, *v4)
    t = (time_call(run_sm, keys, *v4) - base) / INNER
    report("sort_multi_operand_2e21", ms=round(t * 1e3, 2))

    # keys only
    def sort_k_op(i, keys):
        (sk,) = jax.lax.sort((keys + i,), num_keys=1, is_stable=True)
        return sk[0].astype(jnp.float32)

    run_sk = chained(sort_k_op, None)
    run_sk(keys)
    t = (time_call(run_sk, keys) - base) / INNER
    report("sort_keys_only_2e21", ms=round(t * 1e3, 2))

    # --- 4. epilogue pieces -------------------------------------------------
    sys.path.insert(0, "/root/repo")
    from obj2voxel_tpu.ops.combine import combine_pairs

    rgb = jnp.asarray(np.random.rand(P, 3).astype(np.float32))
    w = jnp.asarray(np.random.rand(P).astype(np.float32))

    def combine_op(i, keys, w, rgb):
        k, v, c = combine_pairs(keys + i, w, rgb, True)
        return k[0].astype(jnp.float32) + v[0, 0] + c.astype(jnp.float32)

    run_c = chained(combine_op, None)
    run_c(keys, w, rgb)
    t = (time_call(run_c, keys, w, rgb) - base) / INNER
    report("combine_pairs_full_2e21", ms=round(t * 1e3, 2))

    # scan alone
    from obj2voxel_tpu.ops.combine import _segment_combine

    head = jnp.asarray(np.random.rand(P) < 0.3)

    def scan_op(i, head, vals):
        out = _segment_combine(head, vals + i, True)
        return out[0, 0] + out[-1, -1]

    run_scan = chained(scan_op, None)
    run_scan(head, vals)
    t = (time_call(run_scan, head, vals) - base) / INNER
    report("assoc_scan_2e21", ms=round(t * 1e3, 2))

    # nonzero compaction alone
    def nz_op(i, keys):
        tail = (keys + i) % 3 == 0
        idxs = jnp.nonzero(tail, size=P, fill_value=P - 1)[0]
        g = keys[idxs]
        return g[0].astype(jnp.float32) + g[-1].astype(jnp.float32)

    run_nz = chained(nz_op, None)
    run_nz(keys)
    t = (time_call(run_nz, keys) - base) / INNER
    report("nonzero_compact_2e21", ms=round(t * 1e3, 2))

    # --- 5. current pallas clip kernel timing --------------------------------
    from obj2voxel_tpu.ops.clip_pallas import clip_pairs_pallas

    PT = 1 << 18
    tri_data = jnp.asarray(np.random.rand(16, PT).astype(np.float32) * 8)
    vox_data = jnp.asarray(np.random.rand(4, PT).astype(np.float32) * 8)

    def clip_op(i, tri_data, vox_data):
        out = clip_pairs_pallas(tri_data + 0.0 * i, vox_data)
        return out[0, 0] + out[-1, -1]

    run_cl = chained(clip_op, None)
    run_cl(tri_data, vox_data)
    t = (time_call(run_cl, tri_data, vox_data) - base) / INNER
    report("clip_pallas_2e18", ms=round(t * 1e3, 2), ns_per_pair=round(t / PT * 1e9, 2))

    report("done", total_s=round(time.perf_counter() - t0, 1))


if __name__ == "__main__":
    main()
