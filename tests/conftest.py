"""Test harness configuration.

Forces JAX onto CPU with 8 virtual devices BEFORE jax is imported anywhere, so
multi-chip sharding tests run without TPU hardware (the analog of the
reference's serial-vs-parallel duality, SURVEY.md section 4)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The harness environment pre-registers a TPU platform plugin that overrides
# JAX_PLATFORMS, so pinning tests to CPU requires both the env var AND an
# explicit jax.config update before any computation.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not os.environ.get("O2V_TEST_ON_DEVICE"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


#: Small pair tile keeps XLA CPU compile times tolerable in tests.
TEST_PAIR_TILE = 1 << 14


@pytest.fixture
def pair_tile():
    return TEST_PAIR_TILE


def quads_to_tris(verts: np.ndarray, quads: np.ndarray) -> np.ndarray:
    """Quad -> 2-triangle fan, matching the reference's IndexedMeshTriangleStream
    emission order (reference io.cpp:135-155)."""
    tris = []
    for q in quads:
        tris.append(verts[[q[0], q[1], q[2]]])
        tris.append(verts[[q[0], q[2], q[3]]])
    return np.stack(tris).astype(np.float32)


UNIT_CUBE_VERTICES = np.array(
    [
        [0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
        [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1],
    ],
    np.float32,
)

UNIT_CUBE_QUADS = np.array(
    [[0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1], [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3]]
)

THREE_PLANES_VERTICES = np.array(
    [
        [0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0],
        [0.5, 0, 0], [0.5, 0, 1], [0.5, 1, 1], [0.5, 1, 0],
        [1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0],
    ],
    np.float32,
)

THREE_PLANES_QUADS = np.array([[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]])


def expected_unit_cube_voxels(resolution: int) -> int:
    """Closed-form surface voxel count (reference test/main.cpp:120-126)."""
    return 8 + 12 * (resolution - 2) + 6 * (resolution - 2) ** 2


@pytest.fixture
def cube_tris():
    return quads_to_tris(UNIT_CUBE_VERTICES, UNIT_CUBE_QUADS)


@pytest.fixture
def planes_tris():
    return quads_to_tris(THREE_PLANES_VERTICES, THREE_PLANES_QUADS)
