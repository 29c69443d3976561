"""Logging / debug messenger.

TPU-native counterpart of the reference's debug-messenger architecture
(reference: src/logger.h, src/default_debug_messenger.h,
include/nvimgcodec.h:717-793 — severity×category filtered fan-out to user
callbacks). We map onto Python's logging with a severity knob read from
`TPUIMGCODEC_VERBOSITY` (reference analog: PYNVIMGCODEC_VERBOSITY,
python/module.cpp:50-72).
"""
from __future__ import annotations

import logging
import os

_CONFIGURED = False


def _configure() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    verbosity = int(os.environ.get("TPUIMGCODEC_VERBOSITY", "1"))
    level = {
        0: logging.CRITICAL,  # silent
        1: logging.WARNING,
        2: logging.INFO,
        3: logging.DEBUG,
    }.get(verbosity, logging.DEBUG if verbosity > 3 else logging.WARNING)
    logging.basicConfig(
        level=level,
        format="%(asctime)s [%(levelname)s] %(name)s: %(message)s",
    )
    _CONFIGURED = True


def get_logger(name: str) -> logging.Logger:
    _configure()
    return logging.getLogger(name)
