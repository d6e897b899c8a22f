"""Leveled logging with an optional user callback.

Mirrors the voxelio logging surface the reference exposes through its C API
(reference: include/obj2voxel.h:100-120, src/obj2voxel.cpp:658-682): numeric
levels SILENT..DEBUG, a pluggable callback that may swallow messages or fall
through to the default printer, and a module-global level.
"""

from __future__ import annotations

import sys
import time

from ..constants import (
    LOG_LEVEL_DEBUG,
    LOG_LEVEL_ERROR,
    LOG_LEVEL_INFO,
    LOG_LEVEL_SILENT,
    LOG_LEVEL_WARNING,
)

_LEVEL_NAMES = {
    LOG_LEVEL_ERROR: "ERROR",
    LOG_LEVEL_WARNING: "WARNING",
    LOG_LEVEL_INFO: "INFO",
    LOG_LEVEL_DEBUG: "DEBUG",
}


class Logger:
    def __init__(self):
        self.level = LOG_LEVEL_INFO
        self.callback = None
        self.timestamps = False

    def set_level(self, level: int):
        self.level = int(level)

    def get_level(self) -> int:
        return self.level

    def set_callback(self, callback):
        """callback(message, level) -> bool; True means "handled"."""
        self.callback = callback

    def _emit(self, level: int, msg: str):
        if level > self.level or self.level == LOG_LEVEL_SILENT:
            return
        if self.callback is not None and self.callback(msg, level):
            return
        name = _LEVEL_NAMES.get(level, "LOG")
        stamp = time.strftime("%H:%M:%S ") if self.timestamps else ""
        print(f"{stamp}[{name}] {msg}", file=sys.stderr)

    def error(self, msg: str):
        self._emit(LOG_LEVEL_ERROR, msg)

    def warning(self, msg: str):
        self._emit(LOG_LEVEL_WARNING, msg)

    def info(self, msg: str):
        self._emit(LOG_LEVEL_INFO, msg)

    def debug(self, msg: str):
        self._emit(LOG_LEVEL_DEBUG, msg)


log = Logger()
