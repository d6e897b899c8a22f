"""Remaining public API surface: logging callback, worker contract,
mesh boundaries, memory output of paletted formats
(reference obj2voxel.h:100-120, 232-237, 374-396)."""

import numpy as np

import obj2voxel_tpu as o2v
from obj2voxel_tpu import constants as C
from obj2voxel_tpu.utils.log import log


PLANE = np.array(
    [[[0, 0, 0.5], [1, 0, 0.5], [1, 1, 0.5]], [[0, 0, 0.5], [1, 1, 0.5], [0, 1, 0.5]]],
    np.float32,
)


def make_input(tris):
    state = {"i": 0}

    def cb(tri):
        if state["i"] >= len(tris):
            return False
        tri.set_basic(tris[state["i"]])
        state["i"] += 1
        return True

    return cb


def test_log_callback_intercepts_and_falls_through():
    seen = []

    def cb(msg, level):
        seen.append((msg, level))
        return True  # handled: default printer suppressed

    old_level = o2v.get_log_level()
    o2v.set_log_callback(cb)
    o2v.set_log_level(C.LOG_LEVEL_INFO)
    try:
        log.info("hello from test")
        assert seen and seen[-1][0] == "hello from test"
        assert seen[-1][1] == C.LOG_LEVEL_INFO
        # silenced level -> callback not invoked
        o2v.set_log_level(C.LOG_LEVEL_SILENT)
        n = len(seen)
        log.error("should not appear")
        assert len(seen) == n
    finally:
        o2v.set_log_callback(None)
        o2v.set_log_level(old_level)


def test_get_set_log_level_roundtrip():
    old = o2v.get_log_level()
    try:
        o2v.set_log_level(C.LOG_LEVEL_DEBUG)
        assert o2v.get_log_level() == C.LOG_LEVEL_DEBUG
    finally:
        o2v.set_log_level(old)


def test_worker_contract():
    inst = o2v.Instance()
    assert inst.get_worker_count() == 0
    inst.run_worker()
    inst.run_worker()
    assert inst.get_worker_count() == 2
    inst.stop_workers()
    assert inst.get_worker_count() == 0


def test_mesh_boundaries_skip_bounds_computation(pair_tile):
    # a plane at z=0.5 inside custom boundaries [0,2]^3 lands in the lower
    # quarter of the grid instead of being normalized to fill it
    o2v.set_log_level(C.LOG_LEVEL_SILENT)
    try:
        voxels = []

        def out(data, count):
            voxels.append(np.array(data[:count]))
            return True

        inst = o2v.Instance()
        inst._pair_tile = pair_tile
        inst.set_input_callback(make_input(PLANE))
        inst.set_output_callback(out)
        inst.set_resolution(16)
        inst.set_mesh_boundaries([0, 0, 0, 2, 2, 2])
        assert inst.voxelize() == C.ERR_OK
        allv = np.concatenate(voxels)
        zs = set(allv[:, 2].tolist())
        # z=0.5 of a [0,2] range maps to the z ~ r/4 row, not r/2
        assert zs == {4 - 1} or zs == {4}, zs
    finally:
        o2v.set_log_level(C.LOG_LEVEL_INFO)


def test_memory_output_qef(pair_tile):
    o2v.set_log_level(C.LOG_LEVEL_SILENT)
    try:
        inst = o2v.Instance()
        inst._pair_tile = pair_tile
        inst.set_input_callback(make_input(PLANE))
        inst.set_output_memory("qef")
        inst.set_resolution(8)
        assert inst.voxelize() == C.ERR_OK
        data = inst.get_output_memory()
        assert data is not None
        assert data.startswith(b"Qubicle Exchange Format\n")
    finally:
        o2v.set_log_level(C.LOG_LEVEL_INFO)


def test_get_chunk_size_matches_reference():
    assert o2v.Instance().get_chunk_size() == 64
