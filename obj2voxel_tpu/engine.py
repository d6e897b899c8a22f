"""Host-side voxelization pipeline driver.

TPU-native replacement for the reference's engine/orchestrator
(reference: src/obj2voxel.cpp:467-520): the stage-barrier worker pipeline
(bounds -> transform -> sort-into-chunks -> voxelize-chunks) becomes

  host: bounds -> transform -> subdivide -> GLOBAL (slab x bucket) plan
  device: one per-triangle gather into plan order, then per-bucket passes
          (slice rows -> static 2^k broadcast expansion -> rank decode ->
           Pallas clip -> color -> multi-operand sort -> streaming segmented
           combine -> compaction re-sort) -> hierarchical device merges ->
          optional 2x downscale -> compacted voxel stream per z-slab

Round-2 hot-path rules (all measured on the TPU, probes/probe_r2.out):
gathers only at TRIANGLE granularity (per-pair gathers ran at 2 GB/s and
dominated round 1); expansion factors are STATIC per pass so turning rows
into pair slots is pure data movement; sorts are the compaction primitive
(multi-operand sort 3.1 ms vs 34 ms nonzero-compaction at 2^21); host<->link
round trips are batched (the relay costs ~33 ms per pull regardless of size).
Slabs keep voxel keys within int32 and stream the output in z order with
bounded memory, the property the reference gets from 64^3 chunking
(README.adoc:272-278).
"""

from __future__ import annotations

import dataclasses
import functools
import os as _os

import jax

# The slab kernels are compiled once per (budget, tile) size; persist the
# executables so CLI invocations after the first skip the multi-minute XLA
# remote compile.
#
# DEVICE ONLY.  The persistent cache is never enabled on the CPU platform:
# XLA's CPU cache entries are AOT executables specialized to the exact host
# CPU / XLA feature set, and its cache key covers neither, so a ~/.cache that
# persists across container hosts serves stale AOT code (cpu_aot_loader
# "machine type ... doesn't match ... SIGILL") -- the roving full-suite
# segfault of rounds 3-4.  Round 4 keyed the directory by a /proc/cpuinfo
# fingerprint, but (a) hosts with identical cpuinfo text can still differ in
# XLA's derived feature set (MULTICHIP_r04 logged mismatches through the
# fingerprinted dir), and (b) round 4 ALSO hit a second crash class, a
# SIGSEGV inside compilation_cache.put_executable_and_time while *writing*
# a large CPU executable mid-suite.  CPU compiles here are seconds each and
# in-process jit caching already dedups within a run, so the persistent
# cache buys little on CPU and costs the correctness gate; only the TPU
# remote-compile service (minutes per kernel) needs it.  Set
# O2V_COMPILE_CACHE=/path explicitly to force a cache on any platform.
_cache_dir = _os.environ.get("O2V_COMPILE_CACHE")
if _cache_dir is None:
    _plat = getattr(jax.config, "jax_platforms", None) or _os.environ.get(
        "JAX_PLATFORMS", ""
    )
    # first platform in the priority list wins at runtime; the container
    # default is "axon,cpu", so a substring test ("cpu" in ...) misrouted
    # DEVICE compiles into the CPU bucket
    if _plat and _plat.split(",")[0].strip() == "cpu":
        _cache_dir = "0"
    else:
        _cache_dir = _os.path.expanduser("~/.cache/obj2voxel_tpu_xla")
if _cache_dir and _cache_dir != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - older jax without these flags
        pass

import jax.numpy as jnp
import numpy as np

from .constants import BLEND_STRATEGY, MAX_STRATEGY, PAIR_TILE, TRI_MATERIALLESS
from .geometry import compute_mesh_transform, mesh_bounds
from .utils import debug as _dbg
from .utils.log import log as _log
from .ops.clip import clip_channels
from .ops.clip_pallas import clip_pairs_pallas
from .ops.color import TexturePool, sample_pair_colors_uv
from .ops.combine import (
    INVALID_KEY,
    combine_channels,
    combine_pairs,
    compact_channels,
    downscale_keys,
    finalize_colors,
    merge_combined,
    pack_argb,
    premultiply,
    sort_channels,
)
from .ops.plan import plan_mesh
from .ops.plan_device import plan_mesh_device
from .ops.subdivide import subdivide_soup

#: Maximum pairs materialized per device pass (raw buffer ~20 B/pair).
#: Default 2^21; override with O2V_MAX_PASS_BUDGET (the round-1 cap came from
#: the environment's compile helper OOMing on the old giant fused graphs --
#: the round-2 pass program is far smaller, so larger budgets are probed).
MAX_PASS_BUDGET = int(_os.environ.get("O2V_MAX_PASS_BUDGET", 1 << 21))

#: Allowed pass-buffer sizes.  Each distinct size costs one (cached) XLA
#: compile per expansion factor, so the ladder is deliberately coarse; the
#: scheduler covers each segment greedily with full rungs so tail waste is
#: bounded by the smallest rung.
BUDGET_LADDER = (1 << 14, 1 << 17, 1 << 21, 1 << 22, 1 << 23)

#: Allowed merge-program sizes (rows).  Merges are sort+combine only, so much
#: larger programs compile than full passes; slabs whose compacted pass
#: outputs exceed the top rung fold hierarchically on device.
MERGE_LADDER = (1 << 12, 1 << 16, 1 << 20, 1 << 21, 1 << 22, 1 << 23, 1 << 24,
                1 << 25)

#: Dispatch counters for the most recent stream_slabs call (diagnostics and
#: test assertions for the batched-dispatch path; not thread-safe by design).
WAVE_STATS = {"passes": 0, "dispatches": 0, "batched": 0}


def _chunk_budget(remaining_slots: int, expand: int, max_budget: int) -> int:
    """Pick the pass budget for the next chunk of a segment: the smallest
    ladder rung covering the remaining slots, else the max.  Rounding UP
    minimizes pass count -- wasted tail slots cost ~7 ns each on device while
    every extra pass costs a dispatch (and fragmented schedules measured 53
    passes where 5 suffice).  Rungs below `expand` cannot host one row."""
    usable = [b for b in BUDGET_LADDER if expand <= b <= max_budget]
    if not usable:
        return max_budget
    for b in usable:
        if b >= remaining_slots:
            return b
    return usable[-1]


@dataclasses.dataclass
class TriangleSoup:
    """Flat triangle arrays, the device-friendly mesh representation."""

    verts: np.ndarray  # (N, 3, 3) float32
    uvs: np.ndarray  # (N, 3, 2) float32
    types: np.ndarray  # (N,) int32 (TRI_*)
    rgb: np.ndarray  # (N, 3) float32 flat colors (white for materialless)
    tex: np.ndarray  # (N,) int32 texture ids, -1 if none

    @staticmethod
    def empty() -> "TriangleSoup":
        return TriangleSoup(
            np.zeros((0, 3, 3), np.float32),
            np.zeros((0, 3, 2), np.float32),
            np.zeros((0,), np.int32),
            np.zeros((0, 3), np.float32),
            np.full((0,), -1, np.int32),
        )

    @staticmethod
    def from_vertices(verts: np.ndarray) -> "TriangleSoup":
        n = verts.shape[0]
        return TriangleSoup(
            np.asarray(verts, np.float32),
            np.zeros((n, 3, 2), np.float32),
            np.full((n,), TRI_MATERIALLESS, np.int32),
            np.ones((n, 3), np.float32),
            np.full((n,), -1, np.int32),
        )

    @staticmethod
    def from_simple_mesh(vertices, quads: bool = False) -> "TriangleSoup":
        """Raw (M*3,) or (M, 3) float vertex list of triangles or quads
        (reference ITriangleStream::fromSimpleMesh, io.cpp:82-116; quads split
        as (0,1,2) + (1,2,3) like the reference's strip-style emission)."""
        v = np.asarray(vertices, np.float32).reshape(-1, 3)
        per = 4 if quads else 3
        assert v.shape[0] % per == 0
        prims = v.reshape(-1, per, 3)
        if quads:
            tris = np.concatenate(
                [prims[:, [0, 1, 2]], prims[:, [0, 2, 3]]], axis=1
            ).reshape(-1, 3, 3)
        else:
            tris = prims
        return TriangleSoup.from_vertices(np.ascontiguousarray(tris))

    @staticmethod
    def from_indexed_mesh(vertices, elements, quads: bool = False) -> "TriangleSoup":
        """Indexed triangle/quad mesh (reference
        ITriangleStream::fromIndexedMesh, io.cpp:118-161)."""
        v = np.asarray(vertices, np.float32).reshape(-1, 3)
        e = np.asarray(elements, np.int64).reshape(-1, 4 if quads else 3)
        if quads:
            idx = np.concatenate([e[:, [0, 1, 2]], e[:, [0, 2, 3]]], axis=1).reshape(
                -1, 3
            )
        else:
            idx = e
        return TriangleSoup.from_vertices(np.ascontiguousarray(v[idx]))

    def __len__(self):
        return self.verts.shape[0]


def _pow2_at_least(n: int, minimum: int = 256) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


def _pad_tris(arrays, n_pad):
    out = []
    for a in arrays:
        pad = n_pad - a.shape[0]
        if pad:
            a = np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])
        out.append(a)
    return out


# --- jitted device stages --------------------------------------------------


@jax.jit
def _transform_verts(verts, matrix, translation):
    # Row-by-row dot products in full f32 (no bf16 matmul path): vertex
    # coordinates must be exact to preserve the reference's floor/epsilon
    # semantics.
    out = jnp.einsum(
        "ntd,rd->ntr", verts, matrix, precision=jax.lax.Precision.HIGHEST
    )
    return (out + translation).astype(jnp.float32)


def _combine_epilogue(
    combined, stride, z_lo, is_blend, do_downscale,
    use_kernel=False, finalize=True,
):
    """Shared tail of a pass: optional downscale, finalize.

    combined: (keys, chans, count) from combine_pairs/combine_channels.
    finalize=False (multi-pass slabs, where a later merge produces the real
    output) skips the xyz/argb materialization -- div/mods plus color packing
    over the full budget that would otherwise be computed and thrown away."""
    keys, chans, count = combined

    def down(args):
        k, ch, _ = args
        dk = downscale_keys(k, stride)
        return merge_combined(dk, ch, is_blend, use_kernel=use_kernel)

    keys, chans, count = jax.lax.cond(
        do_downscale, down, lambda a: a, (keys, chans, count)
    )

    if not finalize:
        return keys, chans, None, None, count

    out_stride = jnp.where(do_downscale, stride // 2, stride)
    z_base = jnp.where(do_downscale, z_lo // 2, z_lo)
    x = keys % out_stride
    y = (keys // out_stride) % out_stride
    z = keys // (out_stride * out_stride) + z_base
    xyz = jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
    argb = pack_argb(finalize_colors(chans))
    return keys, chans, xyz, argb, count


def pass_scalars(r0, n_rows, local_base, z_lo, z_hi, stride,
                 is_blend, do_downscale):
    """Bundle a pass's 8 dynamic scalars into ONE (8,) int32 device upload.

    Each `jnp.int32(x)` at a `_bucket_pass` call site is a separate
    host->device transfer; through the relay the wave loop's ~10 scalar
    uploads per pass measured as the bulk of a ~150 ms host dispatch window
    per 34-pass wave (O2V_TIMING dispatch/drain split, round 4).  One packed
    array cuts that to one upload + a 4-arg jit call per pass."""
    return jnp.asarray(np.array(
        [r0, n_rows, local_base, z_lo, z_hi, stride,
         int(is_blend), int(do_downscale)], np.int32,
    ))


@functools.partial(
    jax.jit,
    static_argnames=(
        "expand", "budget", "use_pallas", "ref_weights", "wide_local",
        "finalize", "fused", "pack",
    ),
)
def _bucket_pass(
    tableT,
    pixels,
    meta,
    scal,
    *,
    expand,
    budget,
    use_pallas,
    ref_weights=False,
    wide_local=False,
    finalize=True,
    fused=None,
    pack=True,
):
    """One fused pass over a contiguous run of same-bucket triangle rows.

    tableT is the (24, M) channel-major triangle table already gathered into
    global (slab, bucket) order (ops/plan.py).  Rows [r0, r0 + budget/expand)
    each own `expand` = 2^k pair slots; `expand` is STATIC, so turning rows
    into pairs is a plain broadcast+reshape (pure data movement) and the
    within-AABB rank is `iota & (expand - 1)`.  This replaces the round-1
    per-pair row gather, which ran at ~2 GB/s and dominated every pass
    (probes/probe_r2.out: 133 ms per 2^21 gathered rows vs 2.3 ms of clip).

    For buckets larger than the budget (huge axis-aligned triangles skipped by
    the subdivision regularizer), expand == budget, one row per pass, and
    `local_base` walks the slot domain across passes.

    Rows at positions >= n_rows (the dynamic-slice overread into neighboring
    segments) are neutralized by forcing their volume to zero.

    fused=None auto-selects the fully fused Pallas pass (ops/pass_fused.py:
    expansion + clip + key + premultiply in one kernel) on the device for
    texture-free, non-giant passes; the XLA pipeline below remains the
    oracle (and the only path for textured meshes / wide_local passes).

    Multi-pass (finalize=False) fused passes compact IN-KERNEL by default
    (round 4): the pack=True fused kernel DMAs each block's live prefix to a
    running output offset (ops/pack_pallas.py), replacing the per-pass
    5-operand compaction sort -- linear-time, so the 2^22+ budget rungs no
    longer pay the bitonic sort's superlinearity.  O2V_PACK=0 restores the
    sort path.

    scal: the (8,) int32 dynamic-scalar bundle from `pass_scalars`
    (one upload per pass instead of ~10 -- see its docstring).
    """
    r0 = scal[0]
    n_rows = scal[1]
    local_base = scal[2]
    z_lo = scal[3]
    z_hi = scal[4]
    stride = scal[5]
    is_blend = scal[6] != 0
    do_downscale = scal[7] != 0
    if fused is None:
        fused = (
            use_pallas
            and not wide_local
            and pixels.shape[0] == 1
            and _os.environ.get("O2V_FUSED") != "0"
        )
    R = budget // expand
    rowsT = jax.lax.dynamic_slice(tableT, (0, r0), (24, R))

    if fused:
        # the per-row AABB/volume prologue runs IN-KERNEL (pass_fused.py):
        # assembling the (32, R) aug buffer in XLA measured ~9 ms per
        # 2^21-slot pass at expand=8 (probes/profile_batch.py), more than
        # double the 3.9 ms kernel itself
        from .ops.pass_fused import fused_pass_pallas

        # `pack` is STATIC (threaded from the call site, which reads
        # O2V_PACK per stream_slabs call): an env read here would bake the
        # value of the FIRST trace into the jit cache and silently ignore
        # later toggles in the same process — which handed the round-5
        # merge-runs A/B slot-ordered pack outputs while the merge assumed
        # key-sorted compact tails (probes/profile_merge_r5 first run)
        pass_combine = finalize or _os.environ.get("O2V_PASS_COMBINE") == "1"
        if not pass_combine and pack:
            # in-kernel pack: outputs arrive compacted (live prefix in slot
            # order + <128 INVALID/zero fillers per block); rows past cnt are
            # undefined and masked here to keep the compacted-buffer contract
            # (INVALID/zero tail) the merge assembler relies on.  Slot order
            # vs the sort's key order is equivalent downstream: the slab
            # merge's stable sort sees the same stream order either way
            # (tests/test_pack_pallas.py).  do_downscale is ignored: multi-
            # pass slabs always defer downscaling to the merge.
            key, w, wr, wg, wb, cnt = fused_pass_pallas(
                rowsT, local_base, z_lo, stride, z_hi, n_rows,
                expand=expand, budget=budget,
                textured=False, ref_weights=ref_weights,
                interpret=not use_pallas, pack=True,
            )
            iota = jax.lax.iota(jnp.int32, budget)
            tail = iota >= cnt
            key = jnp.where(tail, INVALID_KEY, key)
            chans = tuple(
                jnp.where(tail, 0.0, c) for c in (w, wr, wg, wb)
            )
            return key, chans, None, None, cnt

        key, w, wr, wg, wb = fused_pass_pallas(
            rowsT, local_base, z_lo, stride, z_hi, n_rows,
            expand=expand, budget=budget,
            textured=False, ref_weights=ref_weights,
            interpret=not use_pallas,
        )
        if pass_combine:
            combined = combine_channels(
                key, (w, wr, wg, wb), is_blend, use_kernel=use_pallas
            )
        else:
            # multi-pass slab: the slab merge deduplicates, so sort+compact
            # only (one stable sort instead of sort+combine+compaction sort)
            combined = compact_channels(key, (w, wr, wg, wb))
        return _combine_epilogue(
            combined, stride, z_lo, is_blend, do_downscale,
            use_kernel=use_pallas, finalize=finalize,
        )

    # per-row voxel AABB, clamped to the grid in x/y and to the slab in z;
    # identical float ops to the host planner (and to the fused kernel's
    # in-kernel prologue) so counts match exactly
    tmin_a, size_a = [], []
    his = (stride, stride, z_hi)
    los = (jnp.int32(0), jnp.int32(0), z_lo)
    for a in range(3):
        va = jnp.minimum(jnp.minimum(rowsT[a], rowsT[a + 3]), rowsT[a + 6])
        vb = jnp.maximum(jnp.maximum(rowsT[a], rowsT[a + 3]), rowsT[a + 6])
        t_lo = jnp.clip(jnp.floor(va).astype(jnp.int32), los[a], his[a])
        t_hi = jnp.clip(jnp.floor(vb).astype(jnp.int32) + 1, los[a], his[a])
        tmin_a.append(t_lo)
        size_a.append(jnp.maximum(t_hi - t_lo, 0))
    sx = jnp.maximum(size_a[0], 1)
    sy = jnp.maximum(size_a[1], 1)
    vol = size_a[0] * size_a[1] * size_a[2]
    row_live = jnp.arange(R, dtype=jnp.int32) < n_rows
    vol = jnp.where(row_live, vol, 0)

    def expand_rows(x):
        """(C, R) -> (C, budget): each row repeated `expand` times.

        jnp.repeat, NOT broadcast+reshape: the (C, R, K) -> (C, R*K)
        minor-dim merge lowers to a lane relayout that measured 42.8 ms per
        2^21 slots on the TPU, while repeat measures 6.9 ms bit-identically
        (probes/profile_expand.py)."""
        return jnp.repeat(x, expand, axis=1)

    tri_data = expand_rows(rowsT[0:16])  # 9 verts + 6 UVs + pad
    aug = expand_rows(
        jnp.stack([tmin_a[0], tmin_a[1], tmin_a[2], sx, sy, vol], axis=0)
    )

    iota = jnp.arange(budget, dtype=jnp.int32)
    local = local_base + (iota & jnp.int32(expand - 1))
    valid = local < aug[5]
    if not wide_local:
        # float-reciprocal rank decode with one correction step: exact for
        # local < 2^23 (rel. err of lf*(1/s) < 2^-24 * local < 1, so the
        # floored quotient is off by at most 1 and the residual check fixes
        # it) and ~1.6x faster than integer div/mod on the VPU
        # (probes/profile_expand.py).  Normal passes have local < expand
        # <= 2^23; only giant-triangle passes walk local_base past that.
        def _divmod(lf, sf):
            q = jnp.floor(lf * (1.0 / sf))
            r = lf - q * sf
            q = jnp.where(r < 0, q - 1.0, jnp.where(r >= sf, q + 1.0, q))
            return lf - q * sf, q

        sxf = aug[3].astype(jnp.float32)
        syf = aug[4].astype(jnp.float32)
        mx, rest = _divmod(local.astype(jnp.float32), sxf)
        my, mz = _divmod(rest, syf)
        vx = aug[0] + mx.astype(jnp.int32)
        vy = aug[1] + my.astype(jnp.int32)
        vz = aug[2] + mz.astype(jnp.int32)
    else:
        vx = aug[0] + local % aug[3]
        rest = local // aug[3]
        vy = aug[1] + rest % aug[4]
        vz = aug[2] + rest // aug[4]

    vox_data = jnp.stack(
        [
            vx.astype(jnp.float32),
            vy.astype(jnp.float32),
            vz.astype(jnp.float32),
            jnp.zeros((budget,), jnp.float32),
        ],
        axis=0,
    )
    if use_pallas:
        out = clip_pairs_pallas(tri_data, vox_data)
        w, uv_u, uv_v = out[0], out[1], out[2]
    else:
        w1, u1, v1 = clip_channels(tri_data, vox_data)
        w, uv_u, uv_v = w1[0], u1[0], v1[0]
    w = jnp.where(valid, w, 0.0)
    if ref_weights:
        # reference-fidelity weighting: every occupied voxel weighs the WHOLE
        # input triangle's area, not the clipped piece's (the reference's
        # observable behavior at src/voxelization.cpp:416-417; its per-voxel
        # weight is input_area x piece_count with piece_count almost always 1
        # after subdivision).  Enabled with O2V_WEIGHT_MODE=input_area.
        e1x, e1y, e1z = (rowsT[3] - rowsT[0], rowsT[4] - rowsT[1], rowsT[5] - rowsT[2])
        e2x, e2y, e2z = (rowsT[6] - rowsT[0], rowsT[7] - rowsT[1], rowsT[8] - rowsT[2])
        cx = e1y * e2z - e1z * e2y
        cy = e1z * e2x - e1x * e2z
        cz = e1x * e2y - e1y * e2x
        area = 0.5 * jnp.sqrt(cx * cx + cy * cy + cz * cz)
        area_e = expand_rows(area[None])[0]
        w = jnp.where(w > 0, area_e, 0.0)

    if pixels.shape[0] > 1:  # static: texture pool non-empty
        r_type = expand_rows(rowsT[16:17])[0].astype(jnp.int32)
        r_tex = expand_rows(rowsT[20:21])[0].astype(jnp.int32)
        r_rgb = expand_rows(rowsT[17:20]).T
        colors = sample_pair_colors_uv(uv_u, uv_v, r_type, r_rgb, r_tex, pixels, meta)
    else:
        # texture-free mesh: colorAt is the flat color (white for
        # materialless) -- skips 5 gathers per pair
        colors = expand_rows(rowsT[17:20]).T

    key = (vz - z_lo) * (stride * stride) + vy * stride + vx
    key = jnp.where(w > 0, key.astype(jnp.int32), INVALID_KEY)
    if finalize or _os.environ.get("O2V_PASS_COMBINE") == "1":
        combined = combine_pairs(key, w, colors, is_blend, use_kernel=use_pallas)
    else:
        # multi-pass slab: sort+compact only; the merge deduplicates (see
        # ops/combine.compact_channels)
        combined = compact_channels(key, premultiply(w, colors))
    return _combine_epilogue(
        combined, stride, z_lo, is_blend, do_downscale,
        use_kernel=use_pallas, finalize=finalize,
    )


@functools.partial(
    jax.jit,
    static_argnames=("expand", "budget", "nbatch", "use_pallas", "ref_weights",
                     "pack"),
)
def _bucket_pass_batch(
    tableT,
    r0s,
    n_rows_s,
    local_bases,
    z_los,
    z_his,
    stride,
    *,
    expand,
    budget,
    nbatch,
    use_pallas,
    ref_weights=False,
    pack=True,
):
    """`nbatch` same-shape fused passes in ONE dispatch.

    Batches the fused-pass fast path of `_bucket_pass` (texture-free,
    non-giant, multi-pass-slab passes with finalize=False) over passes that
    share the static (expand, budget) but differ in traced scalars — passes
    from DIFFERENT slabs batch together (z_lo/z_hi ride in the per-pass scalar
    rows).  One kernel launch plus one batched compaction sort amortizes the
    per-dispatch floor (~6 ms through the relay) that made up ~1/3 of a warm
    2^21-slot pass.

    r0s/n_rows_s/local_bases/z_los/z_his: (nbatch,) int32.
    Returns (keys (nbatch, budget) sorted per row, chans 4 x (nbatch, budget),
    counts (nbatch,) live pairs) — the batched equivalent of
    `compact_channels` output for each pass.
    """
    from .ops.pass_fused import fused_pass_batch_pallas

    R = budget // expand
    # lane-axis concat of the per-pass row slices; the AABB/volume prologue
    # runs in-kernel (the old (B, 32, R) assemble + transpose relayout
    # measured 73 ms per 8 x 2^18-row batch, probes/profile_batch.py)
    rows_cat = jnp.concatenate(
        [
            jax.lax.dynamic_slice(tableT, (0, r0s[i]), (24, R))
            for i in range(nbatch)
        ],
        axis=1,
    )  # (24, B * R)
    scal = jnp.stack(
        [local_bases, z_los,
         jnp.broadcast_to(jnp.asarray(stride, jnp.int32), local_bases.shape),
         z_his, n_rows_s],
        axis=1,
    )
    if pack:
        # in-kernel pack (round 4): each batch element's live pairs land as
        # a dense block-prefix in its own row range (ops/pack_pallas.py) --
        # no batched sort at all, so batching no longer pays the bitonic
        # sort's superlinearity that made O2V_BATCH lose in round 3.  Rows
        # past counts[b] are undefined; mask to the compacted-buffer
        # contract (INVALID/zero tail) like the single-pass path.
        key, w, wr, wg, wb, counts = fused_pass_batch_pallas(
            rows_cat, scal,
            expand=expand, budget=budget, nbatch=nbatch,
            textured=False, ref_weights=ref_weights,
            interpret=not use_pallas, pack=True,
        )
        tail = jax.lax.iota(jnp.int32, budget)[None, :] >= counts[:, None]
        key = jnp.where(tail, INVALID_KEY, key)
        chans = tuple(jnp.where(tail, 0.0, c) for c in (w, wr, wg, wb))
        return key, chans, counts

    key, w, wr, wg, wb = fused_pass_batch_pallas(
        rows_cat, scal,
        expand=expand, budget=budget, nbatch=nbatch,
        textured=False, ref_weights=ref_weights,
        interpret=not use_pallas,
    )
    # batched compact (one stable 5-operand sort over (B, budget); see
    # ops/combine.compact_channels for why multi-pass slabs compact only)
    sk, schans = sort_channels(key, (w, wr, wg, wb))
    counts = jnp.sum((sk != INVALID_KEY).astype(jnp.int32), axis=-1)
    return sk, schans, counts


def _finalize_merge(keys, chans, count, z_lo, *, stride, do_downscale):
    out_stride = stride // 2 if do_downscale else stride
    z_base = z_lo // 2 if do_downscale else z_lo
    x = keys % out_stride
    y = (keys // out_stride) % out_stride
    z = keys // (out_stride * out_stride) + z_base
    xyz = jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
    argb = pack_argb(finalize_colors(chans))
    return xyz, argb, count


@functools.partial(
    jax.jit,
    static_argnames=("stride", "do_downscale", "budget", "use_kernel",
                     "stable"),
)
def _merge_pass(keys, chans, z_lo, is_blend, *, stride, do_downscale, budget,
                use_kernel=False, stable=True):
    """Merge concatenated per-pass compacted outputs and finalize.

    chans: 4-tuple of (P,) premultiplied channels (channel-major: (P, 4)
    value blocks made the merge concat alone cost 87 ms per 2^22 rows,
    probes/profile_merge.py).
    stride/do_downscale are STATIC (one value per run): constant divisors let
    XLA strength-reduce the x/y/z key decode to multiply+shift instead of a
    vector integer division over the whole merge buffer.
    stable=False is valid only for BLEND (ops/combine.combine_channels)."""
    if do_downscale:
        keys = downscale_keys(keys, stride)
    keys, chans, count = merge_combined(
        keys, chans, is_blend, use_kernel=use_kernel, stable=stable
    )
    return _finalize_merge(
        keys, chans, count, z_lo, stride=stride, do_downscale=do_downscale
    )


@functools.partial(
    jax.jit,
    static_argnames=("stride", "budget", "n_block", "levels", "spad",
                     "use_kernel", "interpret"),
)
def _merge_pass_runs(cat_keys, cat_chans, aoff, z_lo, is_blend, *, stride,
                     budget, n_block, levels, spad, use_kernel=True,
                     interpret=False):
    """`_merge_pass` for KEY-SORTED runs: the initial 5-operand bitonic sort
    is replaced by the merge-path Pallas kernel over the aligned-run layout
    (ops/merge_pallas.py).  Valid only when every assembled run is key-sorted
    (compact-sort pass tails, fold outputs) and without downscaling
    (downscale_keys before a RE-sort is how the supersampled merge defines
    its combine order; this path never re-sorts)."""
    from .ops.combine import combine_presorted
    from .ops.merge_pallas import merge_runs_pallas

    keys, chans = merge_runs_pallas(
        cat_keys, cat_chans, aoff, p=budget, n_block=n_block, levels=levels,
        spad=spad, interpret=interpret,
    )
    keys = jax.lax.slice(keys, (0,), (budget,))
    chans = tuple(jax.lax.slice(c, (0,), (budget,)) for c in chans)
    keys, chans, count = combine_presorted(
        keys, chans, is_blend, use_kernel=use_kernel, interpret=interpret
    )
    return _finalize_merge(
        keys, chans, count, z_lo, stride=stride, do_downscale=False
    )


# --- pipeline --------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("budget", "use_kernel", "stable"))
def _merge_keys(keys, chans, is_blend, *, budget, use_kernel=False,
                stable=True):
    """Device-side fold of concatenated compacted outputs -> compacted
    (keys, chans, count), still in slab-local key space."""
    del budget  # shape key only
    return merge_combined(
        keys, chans, is_blend, use_kernel=use_kernel, stable=stable
    )


_ASM_CACHE: dict = {}


def _make_assembler(shapes, pad_to, out_len=None):
    """One-dispatch dense concat of compacted pass outputs.

    Replaces per-chunk host slicing (`keys[:p2]` — 5 device ops per pass,
    measured ~2.5 ms dispatch each through the relay, ~430 ms per 34-pass
    wave) plus jnp.concatenate with a single jitted program: each chunk's
    FULL sorted buffer is written at its cumulative-live-count offset with
    dynamic_update_slice, in chunk order, so chunk i+1's write overwrites
    chunk i's INVALID/zero tail and the result is the exact dense
    concatenation of the live prefixes.  The buffer carries max budget
    slack so the last full-size write never clamps; offsets are traced, so
    one compiled program serves every wave with the same chunk shapes.

    shapes: per-chunk keys shape — (P,) for single-pass buffers or (B, P)
    for rows of a batched `_bucket_pass_batch` output (the row index arrives
    traced in `rows`, so batch membership costs no extra programs).

    out_len (>= pad_to) extends the returned INVALID/zero-initialized buffer
    past pad_to: the merge-runs path needs window-DMA slack rows after the
    logical P (ops/merge_pallas.merge_runs_pallas)."""
    key = (tuple(shapes), pad_to, out_len)
    fn = _ASM_CACHE.get(key)
    if fn is not None:
        return fn
    ret_len = out_len if out_len is not None else pad_to
    size = ret_len + max(s[-1] for s in shapes)

    @jax.jit
    def asm(offsets, rows, ks, chs):
        buf_k = jnp.full((size,), INVALID_KEY, jnp.int32)
        buf_c = [jnp.zeros((size,), jnp.float32) for _ in range(4)]
        for i, k in enumerate(ks):
            off = offsets[i]
            ch = chs[i]
            if k.ndim == 2:
                k = jax.lax.dynamic_index_in_dim(k, rows[i], 0, keepdims=False)
                ch = [
                    jax.lax.dynamic_index_in_dim(c, rows[i], 0, keepdims=False)
                    for c in ch
                ]
            buf_k = jax.lax.dynamic_update_slice(buf_k, k, (off,))
            for j in range(4):
                buf_c[j] = jax.lax.dynamic_update_slice(buf_c[j], ch[j], (off,))
        return buf_k[:ret_len], tuple(c[:ret_len] for c in buf_c)

    _ASM_CACHE[key] = fn = asm
    return fn


def _assemble_outputs(chunk, pad_to, offsets=None, out_len=None):
    """chunk: list of (keys, chans 4-tuple, live_count[, batch_row]) with each
    buffer compacted (live prefix, INVALID/zero tail); keys is (P,) or (B, P)
    with batch_row selecting the row.  Returns the dense (pad_to,) concat of
    the live prefixes, INVALID/zero padded.

    offsets (optional) overrides the dense cumulative-count placement, e.g.
    with block-ALIGNED offsets for the merge-runs path: the gap rows between
    a chunk's live count and the next offset keep the previous write's
    INVALID/zero tail, so each run region stays key-sorted."""
    shapes = [item[0].shape for item in chunk]
    if offsets is None:
        offs = np.zeros(len(chunk), np.int64)
        np.cumsum([item[2] for item in chunk[:-1]], out=offs[1:])
    else:
        offs = np.asarray(offsets[: len(chunk)], np.int64)
    rows = np.asarray(
        [item[3] if len(item) > 3 else 0 for item in chunk], np.int32
    )
    asm = _make_assembler(shapes, pad_to, out_len)
    return asm(
        jnp.asarray(offs, jnp.int32),
        jnp.asarray(rows),
        [item[0] for item in chunk],
        [item[1] for item in chunk],
    )


def plan_fold_chunks(sizes, cap):
    """Partition indices [0, len) into consecutive groups whose size sums
    stay <= cap (a group always takes at least one item).  The hierarchical
    fold ladder shared by stream_slabs and parallel.mesh.stream_sharded."""
    groups, cur, acc = [], [], 0
    for i, s in enumerate(sizes):
        if cur and acc + s > cap:
            groups.append(cur)
            cur, acc = [], 0
        cur.append(i)
        acc += s
    if cur:
        groups.append(cur)
    return groups


def _fold_outputs(chunk, is_blend, use_pallas, stable=True):
    """Merge a chunk of compacted output entries (same entry layout as
    `_assemble_outputs`) into one full-buffer compacted output (kept
    unsliced; the live count rides along)."""
    rows = sum(item[2] for item in chunk)
    pad_to = next((b for b in MERGE_LADDER if b >= rows), _pow2_at_least(rows))
    cat_keys, cat_chans = _assemble_outputs(chunk, pad_to)
    keys, chans, count = _merge_keys(
        cat_keys,
        cat_chans,
        jnp.bool_(is_blend),
        budget=pad_to,
        use_kernel=use_pallas,
        stable=stable,
    )
    return keys, chans, int(count)


def slab_plan(stride: int, z_extent: int | None = None):
    """Split the grid into z-slabs whose local keys fit in int32.

    Slab heights are even so supersampled downscaling never crosses a slab.
    z_extent defaults to stride (cubical grid); batched dataset-gen stacks
    meshes along z, giving a taller extent.
    """
    r = stride
    if z_extent is None:
        z_extent = r
    max_cells = 2**31 - 2
    h = max(2, min(z_extent, max_cells // (r * r)))
    if h % 2 and h > 1:
        h -= 1
    if r > 1 and h < 2:
        raise ValueError(f"Resolution {r} too large for int32 slab keys")
    slabs = []
    z = 0
    while z < z_extent:
        slabs.append((z, min(z + h, z_extent)))
        z += h
    return slabs


def _pull(arr, count, pow2_min=1 << 10):
    """Pull the first `count` rows, padding the device slice to a pow2 ladder
    so only O(log) slice programs ever compile."""
    if count == 0:
        return np.zeros((0,) + arr.shape[1:], arr.dtype)
    padded = _pow2_at_least(count, pow2_min)
    padded = min(padded, arr.shape[0])
    return np.asarray(arr[:padded])[:count]


def voxelize_soup(
    soup: TriangleSoup,
    pool: TexturePool | None = None,
    *,
    resolution: int,
    supersampling: int = 1,
    strategy: int = MAX_STRATEGY,
    unit_transform=None,
    bounds=None,
    pair_tile: int = PAIR_TILE,
    max_pass_budget: int = MAX_PASS_BUDGET,
    subdivide: bool = True,
):
    """Voxelize a triangle soup; yields (xyz int32 (K,3), argb uint32 (K)) per slab.

    Mirrors obj2voxel_voxelize's compute core (reference obj2voxel.cpp:578-637)
    minus I/O: caller streams the yielded voxel batches into a sink.
    """
    n = len(soup)
    if n == 0:
        return

    sample_res = resolution * supersampling
    is_blend = bool(strategy == BLEND_STRATEGY)
    do_down = bool(supersampling > 1)

    if bounds is None:
        mesh_min, mesh_max = mesh_bounds(soup.verts)
    else:
        mesh_min = np.asarray(bounds[0], np.float32)
        mesh_max = np.asarray(bounds[1], np.float32)
    transform = compute_mesh_transform(mesh_min, mesh_max, sample_res, unit_transform)

    if pool is None:
        pool = TexturePool()
    pixels_np, meta_np = pool.device_arrays()
    pixels = jnp.asarray(pixels_np)
    meta = jnp.asarray(meta_np)

    # Transform on host (cheap affine, float32 like the reference) so the
    # subdivision work-regularizer can run in voxel space before upload.
    verts_host = transform.apply(soup.verts)
    if subdivide:
        verts_host, uvs_host, tri_index = subdivide_soup(verts_host, soup.uvs)
        types_host = soup.types[tri_index]
        rgb_host = soup.rgb[tri_index]
        tex_host = soup.tex[tri_index]
    else:
        uvs_host, types_host, rgb_host, tex_host = (
            soup.uvs, soup.types, soup.rgb, soup.tex,
        )

    from .io import debug_stl

    if debug_stl.enabled():
        debug_stl.record(verts_host)

    gen = voxelize_grid(
        verts_host,
        uvs_host,
        types_host,
        rgb_host,
        tex_host,
        pixels,
        meta,
        stride=sample_res,
        z_extent=sample_res,
        is_blend=is_blend,
        do_down=do_down,
        pair_tile=pair_tile,
        max_pass_budget=max_pass_budget,
    )
    # the inner generator owns the host arrays now (and frees them after the
    # device upload); dropping this frame's references keeps peak RSS bounded
    # by the device table, not three host copies of it
    del verts_host, uvs_host, types_host, rgb_host, tex_host
    yield from gen


def voxelize_grid(
    verts_host,
    uvs_host,
    types_host,
    rgb_host,
    tex_host,
    pixels,
    meta,
    *,
    stride: int,
    z_extent: int,
    is_blend: bool,
    do_down: bool,
    pair_tile: int = PAIR_TILE,
    max_pass_budget: int = MAX_PASS_BUDGET,
):
    """Core streaming loop over z-slabs for pre-transformed triangles.

    The grid spans [0, stride) in x/y and [0, z_extent) in z (batched
    dataset-gen stacks meshes along z)."""
    n_sub = verts_host.shape[0]
    if n_sub == 0:
        return
    sample_res = stride

    # Host-side AABBs feed the per-slab bucket planner (x/y grid-clamped,
    # z left unclamped -- the planner clamps per slab).  int32: coordinates
    # are grid-bounded, and at 10M+ triangles the int64 versions alone were
    # ~0.6 GB of the config-4 RSS.
    clamp_hi = np.array([stride, stride, z_extent], np.float32)
    vmin_h = np.clip(np.floor(verts_host.min(axis=1)), 0, clamp_hi).astype(np.int32)
    vmax_h = np.clip(np.floor(verts_host.max(axis=1)) + 1, 0, clamp_hi).astype(np.int32)

    n_pad = _pow2_at_least(n_sub)
    table_dev = jnp.asarray(
        build_tri_table(
            verts_host, uvs_host, types_host, rgb_host, tex_host, n_pad=n_pad
        )
    )
    # the generator frame stays alive for the whole stream: drop the host
    # copies (~1.2 GB at 10M subdivided triangles) now that the table lives
    # on device
    del verts_host, uvs_host, types_host, rgb_host, tex_host
    yield from stream_slabs(
        table_dev,
        pixels,
        meta,
        aabb_host=(vmin_h, vmax_h),
        stride=stride,
        z_extent=z_extent,
        is_blend=is_blend,
        do_down=do_down,
        pair_tile=pair_tile,
        max_pass_budget=max_pass_budget,
    )


def build_tri_table(verts, uvs, types, rgb, tex, n_pad: int | None = None) -> np.ndarray:
    """Pack per-triangle data into one (N, 24) float32 row table; the first 16
    channels are exactly the clip kernel's tri_data layout so a pass slices
    them without shuffling: [0:9] vertex coords, [9:15] UVs, [15] padding,
    [16] type, [17:20] rgb, [20] texture id (float-encoded; exact below 2^24),
    [21:24] padding.

    n_pad pads the table with zero rows IN PLACE of a prior _pad_tris pass:
    padding the five source arrays first cost a transient +1.3 GB at the
    config-4 scale (probes/profile_memory.py) for copies that were freed
    right after packing."""
    n = verts.shape[0]
    if n_pad is not None and n_pad < n:
        raise ValueError(f"n_pad={n_pad} smaller than triangle count {n}")
    rows = n if n_pad is None else n_pad
    table = np.zeros((rows, 24), np.float32)
    table[:n, 0:9] = verts.reshape(n, 9)
    table[:n, 9:15] = uvs.reshape(n, 6)
    table[:n, 16] = types.astype(np.float32)
    table[:n, 17:20] = rgb
    table[:n, 20] = tex.astype(np.float32)
    return table


def _schedule_passes(segments, max_budget):
    """Turn one slab's (bucket) segments into pass descriptors.

    Yields (expand, budget, r0, n_rows, local_base, wide_local) tuples;
    expand, budget, and wide_local are static (jit keys, bounded by the
    BUDGET_LADDER x log2(budget) grid), the rest are traced scalars.
    wide_local marks giant-triangle passes whose slot rank can exceed 2^23
    (they need exact integer rank decode instead of the float fast path).
    """
    passes = []
    for seg in segments:
        if (1 << seg.k) <= max_budget:
            r = seg.r0
            while r < seg.r1:
                remaining = seg.r1 - r
                budget = _chunk_budget(remaining << seg.k, 1 << seg.k, max_budget)
                rows = min(max(1, budget >> seg.k), remaining)
                passes.append((1 << seg.k, budget, r, rows, 0, False))
                r += rows
        else:
            # one huge (axis-aligned, unsubdivided) triangle per pass; walk
            # its 2^k slot domain budget slots at a time
            budget = max_budget
            n_sub = -(-(1 << seg.k) // budget)
            for row in range(seg.r0, seg.r1):
                for j in range(n_sub):
                    passes.append((budget, budget, row, 1, j * budget, True))
    return passes


@functools.partial(jax.jit, static_argnames=("pad_to",))
def _gather_sorted(table, order, *, pad_to=None):
    """Gather triangle rows into plan order, channel-major (24, M).

    `pad_to` sizes the gather ON DEVICE: a host-built order crosses the
    ~15 MB/s relay link, so it is uploaded pow2-of-m sized and the slack
    needed so no pass's dynamic_slice can clamp is manufactured here; a
    device-built order (ops/plan_device.py) arrives oversized (dead-incidence
    tail) and is sliced instead."""
    if pad_to is not None and pad_to > order.shape[0]:
        order = jnp.concatenate(
            [order, jnp.zeros(pad_to - order.shape[0], jnp.int32)]
        )
    elif pad_to is not None and pad_to < order.shape[0]:
        order = jax.lax.slice(order, (0,), (pad_to,))
    return table[order].T


def stream_slabs(
    tri_table,
    pixels,
    meta,
    *,
    aabb_host,
    stride: int,
    z_extent: int,
    is_blend: bool,
    do_down: bool,
    pair_tile: int = PAIR_TILE,
    max_pass_budget: int = MAX_PASS_BUDGET,
    device_outputs: bool = False,
):
    """Device-resident slab streaming: `tri_table` is the packed (N, 24)
    per-triangle row table (see build_tri_table), already on device and in
    voxel space.  `aabb_host` is the host-side (vmin, vmax) int64 pair of
    per-triangle voxel AABBs (vmax exclusive, x/y already grid-clamped), used
    by the global planner.

    With device_outputs=True each yield is (xyz, argb, count) with xyz/argb
    still ON DEVICE (count-padded); the first `count` rows are valid.  Used by
    benchmarks and device-resident consumers to avoid the host link."""
    import time as _time

    timing = _os.environ.get("O2V_TIMING") == "1"
    sample_res = stride
    vmin_h, vmax_h = aabb_host
    max_budget = min(pair_tile, max_pass_budget)

    _t0 = _time.perf_counter()
    # device-side plan (sort + order stay on device; two tiny pulls) with a
    # host fallback for many-slab grids (batch mode) or if disabled
    tableT_dev, segments = None, None
    if _os.environ.get("O2V_HOST_PLAN") != "1":
        # gather_slack makes the planner return the plan-order gathered
        # table directly, dispatched before its blocking bounds pull -- the
        # ~200 ms row-latency-bound gather (probes/probe_gather_sorted.py)
        # overlaps the pull + host segment loop instead of the first wave
        # O2V_GROUP: triangles per planning unit.  G=8 makes the plan-order
        # gather move (8*24)-wide rows (~13 GB/s vs ~1.3 GB/s at 24 wide,
        # probes/probe_gather_width.py) and shrinks the stage-2 sort 8x, at
        # the cost of group-max bucket slots (mesh-local neighbors rarely
        # differ much).  G=1 restores the per-triangle plan.
        group = int(_os.environ.get("O2V_GROUP", "8"))
        # slab-count hint for the fused planner's speculative stage-2 width:
        # ceil(total slot estimate / per-slab budget).  The greedy packer's
        # slab count is >= this by at most boundary-alignment slack, and the
        # _S_LADDER pow2 rounding absorbs most of that; keep the hint TIGHT --
        # a too-wide s_pad doubles the stage-2 sort AND the early gather's
        # dead tail (measured as a ~0.2 s bench regression when 1.5x margin
        # pushed the 2M bench from s_pad=4 to 8), while a too-narrow one
        # costs a rare second stage-2 dispatch + pull
        # strided sample: the hint only picks a pow2 ladder rung, and the
        # full 10M-row reduction measured 0.2-0.3 s of host time per run
        # (catastrophically more when the CPU is contended) for a number the
        # escalation path already guards
        step = max(1, vmin_h.shape[0] >> 18)
        ext = (
            vmax_h[::step].astype(np.int64) - vmin_h[::step].astype(np.int64)
        ).clip(min=0)
        est_slots = float(ext.prod(axis=1, dtype=np.int64).sum()) * step
        slab_hint = int(est_slots / (4 * max_budget)) + 1
        if timing:
            print(
                f"[o2v-timing]   hint {( _time.perf_counter() - _t0) * 1000:.0f}ms"
                f" (est {est_slots:.3g} -> {slab_hint})",
                flush=True,
            )
        tableT_dev, segments = plan_mesh_device(
            tri_table, vmin_h.shape[0], stride, z_extent,
            slot_budget=4 * max_budget,
            timing=timing,
            gather_slack=max_budget,
            group=group,
            slab_hint=slab_hint,
        )
    if tableT_dev is not None:
        m = segments[-1].r1
        tableT = tableT_dev
    elif segments is not None:
        return  # empty mesh
    else:
        order, segments = plan_mesh(
            vmin_h, vmax_h, stride, z_extent, slot_budget=4 * max_budget
        )
        if order is None:
            return
        m = order.size
        m_up = _pow2_at_least(m, 1 << 10)
        order_up = np.zeros(m_up, np.int32)
        order_up[:m] = order
        # one per-TRIANGLE gather for the whole mesh; padded so no pass's
        # dynamic_slice can clamp (clamping would alias real rows)
        m_pad = _pow2_at_least(m + max_budget, 1 << 10)
        tableT = _gather_sorted(tri_table, jnp.asarray(order_up), pad_to=m_pad)

    use_pallas = jax.default_backend() != "cpu"
    ref_weights = _os.environ.get("O2V_WEIGHT_MODE") == "input_area"

    if timing:
        print(
            f"[o2v-timing] plan+gather {( _time.perf_counter() - _t0) * 1000:.0f}ms "
            f"rows={m} segments={len(segments)}",
            flush=True,
        )

    by_slab: dict[tuple[int, int], list] = {}
    for seg in segments:
        by_slab.setdefault((seg.z_lo, seg.z_hi), []).append(seg)

    # Wave pipelining: dispatch EVERY pass of several slabs back-to-back, pull
    # all their compacted-row counts in ONE transfer, dispatch all the slab
    # merges, pull all merge counts in ONE more transfer, then yield in slab
    # order.  The relay link costs ~33 ms per host pull regardless of size, so
    # per-slab syncs were ~25% of a warm 2M-triangle run.  The wave cap bounds
    # device memory for tall grids (full-budget rows held until a counts pull
    # lets them be sliced down).
    # ~20 B/slot held in flight (compacted keys+vals); 2^27 rows ~ 2.7 GB
    # with the merge buffers on top.  Tune down for huge meshes via env.
    CAP_ROWS = int(_os.environ.get("O2V_WAVE_CAP", 1 << 27))

    # Same-shape passes from multi-pass slabs batch into one dispatch
    # (_bucket_pass_batch): the fused kernel runs grid=(B, blocks) and the
    # compaction is one batched sort, amortizing the ~6 ms per-dispatch floor.
    # Device-only by default (the CPU oracle path would run the fused kernel
    # in interpret mode); O2V_BATCH_FORCE=1 lets tests exercise it on CPU.
    from .ops.pass_fused import BLOCK as _FUSED_BLOCK

    WAVE_STATS.update(passes=0, dispatches=0, batched=0)
    # in-kernel pack vs sort-based compact for NON-finalizing pass tails;
    # read per call and threaded as a STATIC arg (see _bucket_pass)
    pass_pack = _os.environ.get("O2V_PACK") != "0"
    fused_env = _os.environ.get("O2V_FUSED") != "0"
    # Batching is OFF by default: the measured A/B on the chip (round 3,
    # 2M @ 1024^3) is 0.92 s unbatched vs 1.14 s batched — per-pass device
    # time dominates the ~6 ms dispatch floor it amortizes, and both the
    # batched (8, 2^21) compaction sort (10.4 vs 7.4 ms/pass) and the batch
    # assembly are slower than their single-pass equivalents
    # (probes/profile_batch.py).  O2V_BATCH=8 re-enables it.
    batch_cap = int(_os.environ.get("O2V_BATCH", 1))
    can_batch = (
        batch_cap > 1
        and pixels.shape[0] == 1
        and _os.environ.get("O2V_FUSED") != "0"
        and (use_pallas or _os.environ.get("O2V_BATCH_FORCE") == "1")
    )

    slab_list = list(by_slab.items())
    i = 0
    while i < len(slab_list):
        _t1 = _time.perf_counter()
        wave = []
        wave_rows = 0
        batchable: dict[tuple[int, int], list] = {}
        direct = []
        while i < len(slab_list) and (not wave or wave_rows < CAP_ROWS):
            (z_lo, z_hi), slab_segs = slab_list[i]
            i += 1
            passes = _schedule_passes(slab_segs, max_budget)
            multi = len(passes) > 1
            st = {
                "z_lo": z_lo, "z_hi": z_hi, "n": len(passes),
                "handles": [None] * len(passes), "outputs": [], "final": None,
            }
            for pi, desc in enumerate(passes):
                expand, budget, r0, n_rows, local_base, wide_local = desc
                # budget must satisfy the fused kernel's block constraint
                # (tests force tiny budgets below pass_fused.BLOCK)
                if (
                    can_batch and multi and not wide_local
                    and budget % _FUSED_BLOCK == 0
                ):
                    batchable.setdefault((expand, budget), []).append(
                        (st, pi, r0, n_rows, local_base, z_lo, z_hi)
                    )
                else:
                    direct.append((st, pi, desc, multi, z_lo, z_hi))
                wave_rows += budget
            wave.append(st)

        count_parts = []  # per-dispatch count scalars/vectors, pulled as one

        for st, pi, desc, multi, z_lo, z_hi in direct:
            expand, budget, r0, n_rows, local_base, wide_local = desc
            handle = _bucket_pass(
                tableT,
                pixels,
                meta,
                # with several passes downscaling must wait for the merge
                pass_scalars(r0, n_rows, local_base, z_lo, z_hi,
                             sample_res, is_blend, do_down and not multi),
                expand=expand,
                budget=budget,
                use_pallas=use_pallas,
                ref_weights=ref_weights,
                wide_local=wide_local,
                finalize=not multi,
                pack=pass_pack,
                fused=(use_pallas and not wide_local
                       and pixels.shape[0] == 1 and fused_env),
            )
            st["handles"][pi] = ("s", handle, len(count_parts))
            count_parts.append(handle[4])

        n_batched = 0
        for (expand, budget), items in sorted(batchable.items()):
            j = 0
            while j < len(items):
                B = 1
                for cand in (8, 4, 2):
                    if cand <= batch_cap and j + cand <= len(items):
                        B = cand
                        break
                chunk = items[j:j + B]
                j += B
                if B == 1:
                    st, pi, r0, n_rows, local_base, z_lo, z_hi = chunk[0]
                    handle = _bucket_pass(
                        tableT, pixels, meta,
                        pass_scalars(r0, n_rows, local_base, z_lo, z_hi,
                                     sample_res, is_blend, False),
                        expand=expand, budget=budget, use_pallas=use_pallas,
                        ref_weights=ref_weights, wide_local=False,
                        finalize=False, pack=pass_pack,
                        fused=(use_pallas and pixels.shape[0] == 1
                               and fused_env),
                    )
                    st["handles"][pi] = ("s", handle, len(count_parts))
                    count_parts.append(handle[4])
                    continue
                arrs = np.asarray(
                    [(r0, nr, lb, zl, zh) for _, _, r0, nr, lb, zl, zh in chunk],
                    np.int32,
                )
                bh = _bucket_pass_batch(
                    tableT,
                    jnp.asarray(arrs[:, 0]), jnp.asarray(arrs[:, 1]),
                    jnp.asarray(arrs[:, 2]), jnp.asarray(arrs[:, 3]),
                    jnp.asarray(arrs[:, 4]), jnp.int32(sample_res),
                    expand=expand, budget=budget, nbatch=B,
                    use_pallas=use_pallas, ref_weights=ref_weights,
                    pack=pass_pack,
                )
                base = len(count_parts)
                count_parts.append(bh[2])
                for b, (st, pi, *_rest) in enumerate(chunk):
                    st["handles"][pi] = ("b", bh, base, b)
                n_batched += B

        WAVE_STATS["passes"] += sum(st["n"] for st in wave)
        WAVE_STATS["dispatches"] += len(count_parts)
        WAVE_STATS["batched"] += n_batched

        # one batched counts pull for every dispatch in the wave; parts are
        # raw count scalars (or (B,) vectors from batched dispatches) --
        # shaping them here per part would cost one device op each
        _t_disp = _time.perf_counter() if timing else 0.0
        part_offs = np.zeros(len(count_parts) + 1, np.int64)
        np.cumsum(
            [p.shape[0] if p.ndim else 1 for p in count_parts],
            out=part_offs[1:],
        )
        if all(p.ndim == 0 for p in count_parts):
            counts = np.asarray(jnp.stack(count_parts))
        else:
            counts = np.asarray(jnp.concatenate(
                [p if p.ndim else p[None] for p in count_parts]
            ))
        if timing:
            _t2 = _time.perf_counter()
            print(
                f"[o2v-timing]   wave: {len(wave)} slabs "
                f"{sum(st['n'] for st in wave)} passes "
                f"({len(count_parts)} dispatches, {n_batched} batched) "
                f"{(_t2 - _t1) * 1000:.0f}ms "
                f"(dispatch {(_t_disp - _t1) * 1000:.0f}ms, "
                f"drain+pull {(_t2 - _t_disp) * 1000:.0f}ms) "
                f"counts={counts.tolist()}",
                flush=True,
            )
            _t1 = _t2
        for st in wave:
            for tag in st["handles"]:
                if tag[0] == "s":
                    _, (keys, chans, xyz, argb, _c), d = tag
                    c = int(counts[part_offs[d]])
                    if _dbg.DEBUG:
                        _dbg.check_count(c, keys.shape[0], "pass")
                    if st["n"] == 1:
                        st["final"] = (xyz, argb, c)
                    elif c:
                        # keep the FULL compacted buffer; the merge assembler
                        # packs live prefixes in one dispatch (host slicing
                        # here measured ~2.5 ms/op through the relay)
                        st["outputs"].append((keys, chans, c))
                else:
                    _, (keys2, chans2, _cs), d, b = tag
                    c = int(counts[part_offs[d] + b])
                    if _dbg.DEBUG:
                        _dbg.check_count(c, keys2.shape[-1], "batched pass")
                    if c:
                        st["outputs"].append((keys2, chans2, c, b))

        # dispatch the device-side slab merges (hierarchical fold for slabs
        # whose compacted outputs exceed the top merge rung; the round-1 host
        # fallback pulled every pass's rows over the ~15 MB/s relay)
        #
        # BLEND merges COULD sort unstably (segment sums are order-free,
        # ops/combine.py docstring), but the measured A/B found no win --
        # XLA's TPU sort costs the same either way (probes/profile_merge_r5:
        # stable 0.654 s vs unstable 0.709 s medians e2e) -- so stable stays
        # the default and O2V_MERGE_STABLE=0 keeps the experiment reachable.
        merge_stable = not (
            is_blend and _os.environ.get("O2V_MERGE_STABLE") == "0"
        )
        # merge-runs path (O2V_MERGE_RUNS=1): replace the merge's bitonic
        # sort with the merge-path Pallas kernel over already-sorted runs.
        # Requires sort-based pass compaction (compact_channels) so each
        # assembled run is key-sorted: the default in-kernel PACK keeps
        # slot order, so this path only applies with O2V_PACK=0 (or the
        # XLA fallback paths), and never under downscaling (the supersampled
        # merge defines its combine order by sorting AFTER downscale_keys).
        pass_runs_sorted = (
            not pass_pack or not use_pallas or not fused_env
        )
        merge_runs_on = (
            _os.environ.get("O2V_MERGE_RUNS") == "1"
            and pass_runs_sorted
            and not do_down
        )
        merged = []
        for st in wave:
            if st["n"] == 1 or not st["outputs"]:
                merged.append((st, None))
                continue
            pass_outputs = st["outputs"]
            while sum(item[2] for item in pass_outputs) > MERGE_LADDER[-1]:
                before = sum(item[2] for item in pass_outputs)
                groups = plan_fold_chunks(
                    [item[2] for item in pass_outputs], MERGE_LADDER[-1]
                )
                if len(groups) == 1:
                    break  # nothing left to fold (single oversized chunk)
                pass_outputs = [
                    _fold_outputs([pass_outputs[i] for i in g], is_blend,
                                  use_pallas, stable=merge_stable)
                    for g in groups
                ]
                if sum(item[2] for item in pass_outputs) >= before:
                    # > 2^25 distinct live voxels in one slab: folding cannot
                    # shrink further; fall through to one oversized merge
                    # instead of re-dispatching identical folds forever
                    break

            total_rows = sum(item[2] for item in pass_outputs)
            if merge_runs_on and len(pass_outputs) <= 32:
                from .ops.merge_pallas import (
                    _WIN_PAD, build_aoff, pick_block, plan_runs,
                )

                n_blk = pick_block(total_rows)
                offs, levels, spad = plan_runs(
                    [item[2] for item in pass_outputs], n_blk
                )
                merge_pad = next(
                    (b for b in MERGE_LADDER if b >= offs[-1]),
                    _pow2_at_least(offs[-1]),
                )
                merge_pad = max(merge_pad, n_blk)
                out_len = merge_pad + (n_blk // 128 + _WIN_PAD) * 128
                cat_keys, cat_chans = _assemble_outputs(
                    pass_outputs, merge_pad, offsets=offs, out_len=out_len
                )
                handle = _merge_pass_runs(
                    cat_keys,
                    cat_chans,
                    jnp.asarray(build_aoff(offs, spad, merge_pad)),
                    jnp.int32(st["z_lo"]),
                    jnp.bool_(is_blend),
                    stride=sample_res,
                    budget=merge_pad,
                    n_block=n_blk,
                    levels=levels,
                    spad=spad,
                    use_kernel=use_pallas,
                    interpret=not use_pallas,
                )
                merged.append((st, handle))
                continue
            merge_pad = next((b for b in MERGE_LADDER if b >= total_rows),
                             _pow2_at_least(total_rows))
            cat_keys, cat_chans = _assemble_outputs(pass_outputs, merge_pad)
            handle = _merge_pass(
                cat_keys,
                cat_chans,
                jnp.int32(st["z_lo"]),
                jnp.bool_(is_blend),
                stride=sample_res,
                do_downscale=do_down,
                budget=merge_pad,
                use_kernel=use_pallas,
                stable=merge_stable,
            )
            merged.append((st, handle))

        # one batched pull for all merge counts, then yield in slab order
        _t_mdisp = _time.perf_counter() if timing else 0.0
        live = [h for _, h in merged if h is not None]
        mcounts = (
            iter(np.asarray(jnp.stack([h[2] for h in live])).tolist())
            if live else iter(())
        )
        if timing and live:
            _t3 = _time.perf_counter()
            print(
                f"[o2v-timing]   {len(live)} merges "
                f"{(_t3 - _t1) * 1000:.0f}ms "
                f"(dispatch {(_t_mdisp - _t1) * 1000:.0f}ms, "
                f"drain+pull {(_t3 - _t_mdisp) * 1000:.0f}ms)",
                flush=True,
            )
        for st, handle in merged:
            if handle is None:
                if st["final"] is None:
                    continue  # empty slab
                xyz, argb, count = st["final"]
            else:
                xyz, argb, count = handle[0], handle[1], int(next(mcounts))
            _log.spam(
                f"Voxelized slab z[{st['z_lo']},{st['z_hi']}) "
                f"p:{st['n']} -> {count}"
            )
            if _dbg.DEBUG:
                _half = 2 if do_down else 1
                _dbg.check_count(count, xyz.shape[0], "merge")
                _dbg.check_slab_output(
                    xyz, argb, count,
                    res_xy=sample_res // _half,
                    z_extent=z_extent // _half,
                    z_lo=st["z_lo"] // _half,
                    z_hi=st["z_hi"] // _half,
                )
            if count:
                if device_outputs:
                    yield xyz, argb, count
                else:
                    yield _pull(xyz, count), _pull(argb, count)


def voxelize_batch(
    soups,
    pool: TexturePool | None = None,
    *,
    resolution: int,
    supersampling: int = 1,
    strategy: int = MAX_STRATEGY,
    pair_tile: int = PAIR_TILE,
    max_pass_budget: int = MAX_PASS_BUDGET,
):
    """Voxelize many small meshes in one device pipeline (3D-ML dataset-gen).

    Each mesh is independently normalized to its own [0, r)^3 grid, then all
    meshes are stacked along z (mesh i occupies z in [i*r_s, (i+1)*r_s)) so a
    single pair stream / sort covers the whole batch -- the TPU-native answer
    to "voxelize 1k meshes in parallel".  Returns a list of (xyz, argb) per
    mesh, each in that mesh's own coordinate system.
    """
    sample_res = resolution * supersampling
    is_blend = bool(strategy == BLEND_STRATEGY)
    do_down = bool(supersampling > 1)

    if pool is None:
        pool = TexturePool()
    pixels_np, meta_np = pool.device_arrays()
    pixels = jnp.asarray(pixels_np)
    meta = jnp.asarray(meta_np)

    all_v, all_u, all_t, all_c, all_x = [], [], [], [], []
    for i, soup in enumerate(soups):
        if len(soup) == 0:
            continue
        mesh_min, mesh_max = mesh_bounds(soup.verts)
        transform = compute_mesh_transform(mesh_min, mesh_max, sample_res)
        v = transform.apply(soup.verts)
        v, u, tri_index = subdivide_soup(v, soup.uvs)
        v = v.copy()
        v[:, :, 2] += np.float32(i * sample_res)  # stack along z
        all_v.append(v)
        all_u.append(u)
        all_t.append(soup.types[tri_index])
        all_c.append(soup.rgb[tri_index])
        all_x.append(soup.tex[tri_index])

    results = [
        (np.zeros((0, 3), np.int32), np.zeros((0,), np.uint32)) for _ in soups
    ]
    if not all_v:
        return results

    out_res = resolution
    per_mesh_extent = sample_res // supersampling if do_down else sample_res
    for xyz, argb in voxelize_grid(
        np.concatenate(all_v),
        np.concatenate(all_u),
        np.concatenate(all_t),
        np.concatenate(all_c),
        np.concatenate(all_x),
        pixels,
        meta,
        stride=sample_res,
        z_extent=len(soups) * sample_res,
        is_blend=is_blend,
        do_down=do_down,
        pair_tile=pair_tile,
        max_pass_budget=max_pass_budget,
    ):
        mesh_id = xyz[:, 2] // per_mesh_extent
        local = xyz.copy()
        local[:, 2] = xyz[:, 2] % per_mesh_extent
        for m in np.unique(mesh_id):
            sel = mesh_id == m
            old_xyz, old_argb = results[int(m)]
            results[int(m)] = (
                np.concatenate([old_xyz, local[sel]]),
                np.concatenate([old_argb, argb[sel]]),
            )
    del out_res
    return results


def densify(xyz: np.ndarray, argb: np.ndarray, resolution: int) -> np.ndarray:
    """Sparse voxel list -> dense (r, r, r) uint32 ARGB grid (0 = empty)."""
    grid = np.zeros((resolution,) * 3, np.uint32)
    if xyz.shape[0]:
        grid[xyz[:, 0], xyz[:, 1], xyz[:, 2]] = argb
    return grid
