"""ctypes bridge to the native EBCOT Tier-1 coder (native/j2k_t1.cpp),
fanned over a thread pool per codeblock — the TPU-framework analog of the
reference's per-tile executor fan-out
(extensions/nvjpeg2k/cuda_decoder.cpp:601-640)."""
from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from ...native import lib


def t1_decode(data: bytes, w: int, h: int, band: int, num_bps: int,
              num_passes: int) -> np.ndarray:
    """Decode one codeblock → signed int32 [h, w] (no dequant)."""
    L = lib()
    out = np.zeros((h, w), np.int32)
    rc = L.tic_j2k_t1_decode(
        data, len(data), w, h, band, num_bps, num_passes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError(f"J2K T1 decode failed rc={rc}")
    return out


def t1_encode(coefs: np.ndarray, band: int) -> Tuple[bytes, int, int]:
    """Encode one codeblock of signed int32 → (segment, num_bps, num_passes)."""
    L = lib()
    h, w = coefs.shape
    coefs = np.ascontiguousarray(coefs, np.int32)
    cap = w * h * 6 + 1024
    out = (ctypes.c_uint8 * cap)()
    outlen = ctypes.c_int()
    nbps = ctypes.c_int()
    npasses = ctypes.c_int()
    rc = L.tic_j2k_t1_encode(
        coefs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), w, h, band,
        out, cap, ctypes.byref(outlen), ctypes.byref(nbps),
        ctypes.byref(npasses),
    )
    if rc != 0:
        raise ValueError(f"J2K T1 encode failed rc={rc}")
    return bytes(out[: outlen.value]), nbps.value, npasses.value
