"""obj2voxel_tpu: a TPU-native mesh voxelization engine.

A from-scratch rebuild of obj2voxel (github.com/Eisenwave/obj2voxel) designed
for TPU: the per-triangle clip kernel runs as batched, branch-free
Sutherland-Hodgman clipping over (triangle, voxel) pair tiles, the voxel
scatter is a sort + segmented-scan combine, and high resolutions stream
through z-slabs.  See SURVEY.md at the repo root for the full mapping from
the reference's architecture to this one.
"""

from . import constants
from .api import Instance, Texture, Triangle, get_log_level, set_log_callback, set_log_level
from .constants import (
    BLEND_STRATEGY,
    ERR_DOUBLE_VOXELIZATION,
    ERR_IO_ERROR_DURING_VOXEL_WRITE,
    ERR_IO_ERROR_ON_OPEN_INPUT_FILE,
    ERR_IO_ERROR_ON_OPEN_OUTPUT_FILE,
    ERR_NO_INPUT,
    ERR_NO_OUTPUT,
    ERR_NO_RESOLUTION,
    ERR_OK,
    MAX_STRATEGY,
    UV_CLAMP,
    UV_WRAP,
    VERSION,
)
from .engine import TriangleSoup, densify, voxelize_batch, voxelize_soup
from .ops.color import TexturePool

__version__ = VERSION

__all__ = [
    "Instance",
    "Texture",
    "Triangle",
    "TriangleSoup",
    "TexturePool",
    "voxelize_soup",
    "voxelize_batch",
    "densify",
    "set_log_level",
    "get_log_level",
    "set_log_callback",
    "constants",
    "MAX_STRATEGY",
    "BLEND_STRATEGY",
    "UV_CLAMP",
    "UV_WRAP",
    "ERR_OK",
    "ERR_NO_INPUT",
    "ERR_NO_OUTPUT",
    "ERR_NO_RESOLUTION",
    "ERR_IO_ERROR_ON_OPEN_INPUT_FILE",
    "ERR_IO_ERROR_ON_OPEN_OUTPUT_FILE",
    "ERR_IO_ERROR_DURING_VOXEL_WRITE",
    "ERR_DOUBLE_VOXELIZATION",
    "VERSION",
]
