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


def ht_decode(cup: bytes, ref: bytes, num_passes: int, w: int, h: int,
              B: int, ucap: int) -> np.ndarray:
    """Decode one HT (T.814) codeblock → signed int32 [h, w] at plane 0
    (mid-bin reconstruction for truncated streams, matching openjpeg).
    B = Mb - zero_bitplanes; ucap = zero_bitplanes + 1."""
    L = lib()
    out = np.zeros((h, w), np.int32)
    rc = L.tic_ht_decode_block(
        cup, len(cup), ref if ref else None, len(ref or b""),
        num_passes, w, h, B, ucap,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError(f"HTJ2K block decode failed rc={rc}")
    return out


def ht_encode(coefs: np.ndarray,
              num_passes: int = 1) -> Tuple[bytes, bytes, int, int]:
    """Encode one codeblock of signed int32 with the HT (T.814) coder.
    Returns (cleanup_seg, refinement_seg, B, Umax): signal
    zero_bitplanes = Mb - B with Mb >= Umax + (B - 1)."""
    L = lib()
    h, w = coefs.shape
    coefs = np.ascontiguousarray(coefs, np.int32)
    cap = w * h * 8 + 4096
    out = np.zeros(cap, np.uint8)
    lcup = ctypes.c_int32()
    lref = ctypes.c_int32()
    B = ctypes.c_int32()
    umax = ctypes.c_int32()
    rc = L.tic_ht_encode_block(
        coefs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), w, h,
        num_passes, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        ctypes.byref(lcup), ctypes.byref(lref), ctypes.byref(B),
        ctypes.byref(umax),
    )
    if rc != 0:
        raise ValueError(f"HTJ2K block encode failed rc={rc}")
    return (bytes(out[:lcup.value].tobytes()),
            bytes(out[lcup.value:lcup.value + lref.value].tobytes()),
            B.value, umax.value)


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
