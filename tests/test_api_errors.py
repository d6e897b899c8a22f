"""Error-path tests through the public API, mirroring the reference's
error-code tests (reference test/main.cpp:68-118)."""

import numpy as np

import obj2voxel_tpu as o2v
from obj2voxel_tpu import constants as C


class CountingOutput:
    def __init__(self):
        self.voxel_count = 0

    def __call__(self, data, count):
        assert data.shape == (count, 4)
        self.voxel_count += count
        return True


def triangle_input(vertices):
    """Input callback serving raw float triangles (reference testutil.hpp:42-70)."""
    state = {"i": 0}
    verts = np.asarray(vertices, np.float32).reshape(-1, 3, 3)

    def callback(tri):
        if state["i"] >= len(verts):
            return False
        tri.set_basic(verts[state["i"]])
        state["i"] += 1
        return True

    return callback


TRIANGLE = np.array([[0, 0, 0], [0, 0, 1], [1, 0, 0]], np.float32)


def test_error_on_missing_input():
    o2v.set_log_level(C.LOG_LEVEL_SILENT)
    try:
        inst = o2v.Instance()
        inst.set_output_callback(CountingOutput())
        inst.set_resolution(1)
        assert inst.voxelize() == C.ERR_NO_INPUT
    finally:
        o2v.set_log_level(C.LOG_LEVEL_INFO)


def test_error_on_missing_output():
    o2v.set_log_level(C.LOG_LEVEL_SILENT)
    try:
        inst = o2v.Instance()
        inst.set_input_callback(triangle_input(TRIANGLE))
        inst.set_resolution(1)
        assert inst.voxelize() == C.ERR_NO_OUTPUT
    finally:
        o2v.set_log_level(C.LOG_LEVEL_INFO)


def test_error_on_missing_resolution():
    o2v.set_log_level(C.LOG_LEVEL_SILENT)
    try:
        inst = o2v.Instance()
        inst.set_input_callback(triangle_input(TRIANGLE))
        inst.set_output_callback(CountingOutput())
        assert inst.voxelize() == C.ERR_NO_RESOLUTION
    finally:
        o2v.set_log_level(C.LOG_LEVEL_INFO)


def test_error_on_double_voxelization(pair_tile):
    o2v.set_log_level(C.LOG_LEVEL_SILENT)
    try:
        inst = o2v.Instance()
        inst._pair_tile = pair_tile
        inst.set_input_callback(triangle_input(TRIANGLE))
        inst.set_output_callback(CountingOutput())
        inst.set_resolution(4)
        assert inst.voxelize() == C.ERR_OK
        assert inst.voxelize() == C.ERR_DOUBLE_VOXELIZATION
    finally:
        o2v.set_log_level(C.LOG_LEVEL_INFO)


def test_error_on_bad_output_path(pair_tile):
    o2v.set_log_level(C.LOG_LEVEL_SILENT)
    try:
        inst = o2v.Instance()
        inst._pair_tile = pair_tile
        inst.set_input_callback(triangle_input(TRIANGLE))
        inst.set_output_file("/nonexistent_dir_xyz/out.vl32")
        inst.set_resolution(4)
        assert inst.voxelize() == C.ERR_IO_ERROR_ON_OPEN_OUTPUT_FILE
    finally:
        o2v.set_log_level(C.LOG_LEVEL_INFO)
