"""ctypes wrapper for the test-only ground-truth oracle (see oracle.c).

Builds the shared library on first use (cached next to the source). Used by
tests to synthesize the encoded corpus and provide independent reference
decodes — the role OpenCV plays in the reference's tests
(reference: test/python/utils.py:61-72).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "oracle.c")
_SO = os.path.join(_DIR, "liboracle.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = [
        "cc", "-O2", "-shared", "-fPIC", _SRC, "-o", _SO,
        "-ljpeg", "-lpng", "-lwebp", "-lwebpdemux", "-lz", "-ltiff",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        _lib = ctypes.CDLL(_SO)
        _sig(_lib)
    return _lib


c_u8p = ctypes.POINTER(ctypes.c_uint8)
c_i16p = ctypes.POINTER(ctypes.c_int16)


def _sig(L: ctypes.CDLL) -> None:
    L.oracle_free.argtypes = [ctypes.c_void_p]
    L.oracle_webp_free.argtypes = [ctypes.c_void_p]
    L.oracle_jpeg_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(c_u8p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    L.oracle_jpeg_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(c_u8p), ctypes.POINTER(ctypes.c_size_t),
    ]
    L.oracle_jpeg_read_coefficients.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, c_i16p * 4,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    L.oracle_png_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(c_u8p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    L.oracle_png_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(c_u8p), ctypes.POINTER(ctypes.c_size_t),
    ]
    L.oracle_webp_decode_rgba.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(c_u8p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    L.oracle_webp_anim_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(c_u8p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    L.oracle_webp_encode_rgb.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(c_u8p), ctypes.POINTER(ctypes.c_size_t),
    ]
    L.oracle_webp_encode_rgba.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(c_u8p), ctypes.POINTER(ctypes.c_size_t),
    ]
    L.oracle_tiff_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(c_u8p), ctypes.POINTER(ctypes.c_size_t),
    ]
    L.oracle_tiff_encode.restype = ctypes.c_int
    L.oracle_tiff_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(c_u8p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    L.oracle_tiff_decode.restype = ctypes.c_int
    L.oracle_tiff_encode_fax.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(c_u8p), ctypes.POINTER(ctypes.c_size_t),
    ]
    L.oracle_tiff_encode_fax.restype = ctypes.c_int
    L.oracle_tiff_encode_float.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(c_u8p), ctypes.POINTER(ctypes.c_size_t),
    ]
    L.oracle_tiff_encode_float.restype = ctypes.c_int
    L.oracle_tiff_encode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(c_u8p), ctypes.POINTER(ctypes.c_size_t),
    ]
    L.oracle_tiff_encode_jpeg.restype = ctypes.c_int


SUBSAMP = {"444": 0, "422": 1, "420": 2, "gray": 3, "440": 4, "411": 5, "410": 6}


def jpeg_decode(data: bytes, fancy_upsampling: bool = True) -> np.ndarray:
    L = lib()
    out = c_u8p()
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    rc = L.oracle_jpeg_decode(data, len(data), ctypes.byref(out),
                              ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch),
                              int(fancy_upsampling))
    if rc != 0:
        raise RuntimeError("oracle jpeg decode failed")
    n = w.value * h.value * ch.value
    arr = np.ctypeslib.as_array(out, (n,)).copy()
    L.oracle_free(out)
    a = arr.reshape(h.value, w.value, ch.value)
    return a[:, :, 0] if ch.value == 1 else a


def jpeg_encode_arith(pix: np.ndarray, quality: int = 90,
                      subsamp: str = "420", progressive: bool = False,
                      restart_interval: int = 0) -> bytes:
    """Arithmetic-coded JPEG (T.81 Annex K). Raises RuntimeError if this
    libjpeg build lacks arithmetic coding support."""
    L = lib()
    pix = np.ascontiguousarray(pix, np.uint8)
    if pix.ndim == 2:
        pix = pix[:, :, None]
    h, w, ch = pix.shape
    if ch == 1:
        subsamp = "gray"
    out = c_u8p()
    outlen = ctypes.c_size_t()
    rc = L.oracle_jpeg_encode_arith(pix.tobytes(), w, h, ch, quality,
                                    SUBSAMP[subsamp], int(progressive),
                                    restart_interval,
                                    ctypes.byref(out), ctypes.byref(outlen))
    if rc != 0:
        raise RuntimeError("oracle arithmetic jpeg encode failed")
    data = ctypes.string_at(out, outlen.value)
    L.oracle_free(out)
    return data


def jpeg_encode_spectral(pix: np.ndarray, quality: int = 90,
                         subsamp: str = "420", split: int = 5,
                         restart_interval: int = 0) -> bytes:
    """Progressive JPEG with spectral-selection-only scans (Ah == 0):
    DC scan + two AC band scans per component."""
    L = lib()
    pix = np.ascontiguousarray(pix, np.uint8)
    if pix.ndim == 2:
        pix = pix[:, :, None]
    h, w, ch = pix.shape
    if ch == 1:
        subsamp = "gray"
    out = c_u8p()
    outlen = ctypes.c_size_t()
    rc = L.oracle_jpeg_encode_spectral(pix.tobytes(), w, h, ch, quality,
                                       SUBSAMP[subsamp], split,
                                       restart_interval,
                                       ctypes.byref(out), ctypes.byref(outlen))
    if rc != 0:
        raise RuntimeError("oracle spectral jpeg encode failed")
    data = ctypes.string_at(out, outlen.value)
    L.oracle_free(out)
    return data


def jpeg_encode(pix: np.ndarray, quality: int = 90, subsamp: str = "420",
                progressive: bool = False, optimize: bool = False,
                restart_interval: int = 0) -> bytes:
    L = lib()
    pix = np.ascontiguousarray(pix, np.uint8)
    if pix.ndim == 2:
        pix = pix[:, :, None]
    h, w, ch = pix.shape
    if ch == 1:
        subsamp = "gray"
    out = c_u8p()
    outlen = ctypes.c_size_t()
    rc = L.oracle_jpeg_encode(pix.tobytes(), w, h, ch, quality, SUBSAMP[subsamp],
                              int(progressive), int(optimize), restart_interval,
                              ctypes.byref(out), ctypes.byref(outlen))
    if rc != 0:
        raise RuntimeError("oracle jpeg encode failed")
    data = ctypes.string_at(out, outlen.value)
    L.oracle_free(out)
    return data


def jpeg_read_coefficients(data: bytes):
    """Return ([coef_blocks per comp], [quant per comp], [(h,v) samp])."""
    L = lib()
    coefs = (c_i16p * 4)()
    bw = (ctypes.c_int * 4)()
    bh = (ctypes.c_int * 4)()
    quant = (ctypes.c_uint16 * 256)()
    ncomp = ctypes.c_int()
    hs = (ctypes.c_int * 4)()
    vs = (ctypes.c_int * 4)()
    rc = L.oracle_jpeg_read_coefficients(
        data, len(data), coefs,
        ctypes.cast(bw, ctypes.POINTER(ctypes.c_int)),
        ctypes.cast(bh, ctypes.POINTER(ctypes.c_int)),
        ctypes.cast(quant, ctypes.POINTER(ctypes.c_uint16)),
        ctypes.byref(ncomp),
        ctypes.cast(hs, ctypes.POINTER(ctypes.c_int)),
        ctypes.cast(vs, ctypes.POINTER(ctypes.c_int)),
    )
    if rc != 0:
        raise RuntimeError("oracle jpeg read coefficients failed")
    out_coefs, out_quant, out_samp = [], [], []
    for c in range(ncomp.value):
        n = bw[c] * bh[c] * 64
        arr = np.ctypeslib.as_array(coefs[c], (n,)).copy().reshape(bh[c], bw[c], 64)
        L.oracle_free(coefs[c])
        out_coefs.append(arr)
        out_quant.append(np.array(quant[c * 64:(c + 1) * 64], np.uint16))
        out_samp.append((hs[c], vs[c]))
    return out_coefs, out_quant, out_samp


def png_decode(data: bytes) -> np.ndarray:
    L = lib()
    out = c_u8p()
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    bd = ctypes.c_int()
    rc = L.oracle_png_decode(data, len(data), ctypes.byref(out), ctypes.byref(w),
                             ctypes.byref(h), ctypes.byref(ch), ctypes.byref(bd))
    if rc != 0:
        raise RuntimeError("oracle png decode failed")
    nbytes = w.value * h.value * ch.value * (bd.value // 8)
    raw = ctypes.string_at(out, nbytes)
    L.oracle_free(out)
    if bd.value == 16:
        arr = np.frombuffer(raw, ">u2").astype(np.uint16)
    else:
        arr = np.frombuffer(raw, np.uint8)
    a = arr.reshape(h.value, w.value, ch.value)
    return a[:, :, 0] if ch.value == 1 else a


def png_encode(pix: np.ndarray) -> bytes:
    L = lib()
    if pix.ndim == 2:
        pix = pix[:, :, None]
    h, w, ch = pix.shape
    if pix.dtype == np.uint16:
        bd = 16
        body = pix.astype(">u2").tobytes()
    else:
        bd = 8
        body = np.ascontiguousarray(pix, np.uint8).tobytes()
    out = c_u8p()
    outlen = ctypes.c_size_t()
    rc = L.oracle_png_encode(body, w, h, ch, bd, ctypes.byref(out), ctypes.byref(outlen))
    if rc != 0:
        raise RuntimeError("oracle png encode failed")
    data = ctypes.string_at(out, outlen.value)
    L.oracle_free(out)
    return data


def webp_decode_rgba(data: bytes) -> np.ndarray:
    L = lib()
    out = c_u8p()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = L.oracle_webp_decode_rgba(data, len(data), ctypes.byref(out),
                                   ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise RuntimeError("oracle webp decode failed")
    arr = np.ctypeslib.as_array(out, (h.value * w.value * 4,)).copy()
    L.oracle_webp_free(out)
    return arr.reshape(h.value, w.value, 4)


def webp_anim_decode(data: bytes):
    """Animated WebP → (frames [N,H,W,4] u8, durations_ms list) via
    libwebpdemux's WebPAnimDecoder — independent compositing oracle."""
    L = lib()
    out = c_u8p()
    w = ctypes.c_int()
    h = ctypes.c_int()
    n = ctypes.c_int()
    durs = (ctypes.c_int * 4096)()
    rc = L.oracle_webp_anim_decode(data, len(data), ctypes.byref(out),
                                   ctypes.byref(w), ctypes.byref(h),
                                   ctypes.byref(n), durs, 4096)
    if rc != 0:
        raise RuntimeError(f"oracle webp anim decode failed rc={rc}")
    nf, H, W = n.value, h.value, w.value
    arr = np.ctypeslib.as_array(out, (nf * H * W * 4,)).copy()
    ctypes.CDLL(None).free(out)
    return arr.reshape(nf, H, W, 4), list(durs[:nf])


def webp_decode_yuv(data: bytes):
    """Lossy WebP → (Y, U, V) uint8 planes (YUV420, the exact VP8 decoder
    output before upsampling/color conversion)."""
    L = lib()
    L.oracle_webp_decode_yuv.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    L.oracle_webp_decode_yuv.restype = ctypes.c_int
    cap = max(1 << 22, len(data) * 64)
    y = np.zeros(cap, np.uint8)
    u = np.zeros(cap, np.uint8)
    v = np.zeros(cap, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = L.oracle_webp_decode_yuv(
        data, len(data),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise RuntimeError(f"oracle webp yuv decode failed rc={rc}")
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    return (y[:W * H].reshape(H, W).copy(),
            u[:cw * ch].reshape(ch, cw).copy(),
            v[:cw * ch].reshape(ch, cw).copy())


def webp_encode_rgb(pix: np.ndarray, quality: float = 80.0, lossless: bool = False) -> bytes:
    L = lib()
    pix = np.ascontiguousarray(pix, np.uint8)
    h, w, _ = pix.shape
    out = c_u8p()
    outlen = ctypes.c_size_t()
    rc = L.oracle_webp_encode_rgb(pix.tobytes(), w, h, quality, int(lossless),
                                  ctypes.byref(out), ctypes.byref(outlen))
    if rc != 0:
        raise RuntimeError("oracle webp encode failed")
    data = ctypes.string_at(out, outlen.value)
    L.oracle_webp_free(out)
    return data


def webp_encode_rgba(pix: np.ndarray, quality: float = 80.0,
                     lossless: bool = False) -> bytes:
    L = lib()
    pix = np.ascontiguousarray(pix, np.uint8)
    h, w, _ = pix.shape
    out = c_u8p()
    outlen = ctypes.c_size_t()
    rc = L.oracle_webp_encode_rgba(pix.tobytes(), w, h, quality,
                                   int(lossless), ctypes.byref(out),
                                   ctypes.byref(outlen))
    if rc != 0:
        raise RuntimeError("oracle webp rgba encode failed")
    data = ctypes.string_at(out, outlen.value)
    L.oracle_webp_free(out)
    return data


def tiff_encode(pix: np.ndarray, compression: int = 1, predictor: int = 1,
                planar: int = 1, tile_size: int = 0,
                rows_per_strip: int = 8) -> bytes:
    """compression: 1 none, 5 lzw, 8 deflate, 32773 packbits."""
    L = lib()
    if pix.ndim == 2:
        pix = pix[:, :, None]
    h, w, ch = pix.shape
    if pix.dtype == np.uint16:
        bd = 16
        body = np.ascontiguousarray(pix).tobytes()  # native-endian; libtiff tags endianness
    else:
        bd = 8
        body = np.ascontiguousarray(pix, np.uint8).tobytes()
    out = c_u8p()
    outlen = ctypes.c_size_t()
    rc = L.oracle_tiff_encode(body, w, h, ch, bd, compression, predictor,
                              planar, tile_size, rows_per_strip,
                              ctypes.byref(out), ctypes.byref(outlen))
    if rc != 0:
        raise RuntimeError(f"oracle tiff encode failed rc={rc}")
    data = ctypes.string_at(out, outlen.value)
    L.oracle_free(out)
    return data


def tiff_encode_fax(pix: np.ndarray, compression: int, t4options: int = 0,
                    fillorder: int = 1, rows_per_strip: int = 0) -> bytes:
    """Bilevel fax TIFF: pix [h, w] 0 = white / nonzero = black.
    compression: 2 MH, 3 G3 (t4options: bit0 2-D, bit2 fill), 4 G4."""
    L = lib()
    h, w = pix.shape
    body = np.ascontiguousarray((pix != 0).astype(np.uint8)).tobytes()
    out = c_u8p()
    outlen = ctypes.c_size_t()
    rc = L.oracle_tiff_encode_fax(body, w, h, compression, t4options,
                                  fillorder, rows_per_strip,
                                  ctypes.byref(out), ctypes.byref(outlen))
    if rc != 0:
        raise RuntimeError(f"oracle tiff fax encode failed rc={rc}")
    data = ctypes.string_at(out, outlen.value)
    L.oracle_free(out)
    return data


def tiff_encode_float(pix: np.ndarray, compression: int = 8,
                      predictor: int = 1, rows_per_strip: int = 8) -> bytes:
    """float32 TIFF (SampleFormat IEEE FP); predictor 3 = floating-point
    horizontal differencing."""
    L = lib()
    if pix.ndim == 2:
        pix = pix[:, :, None]
    h, w, ch = pix.shape
    # copy: libtiff's predictor differencing modifies the write buffer
    # in place (documented TIFFWriteScanline behavior)
    body = np.ascontiguousarray(pix, np.float32).copy()
    out = c_u8p()
    outlen = ctypes.c_size_t()
    rc = L.oracle_tiff_encode_float(
        body.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w, h, ch,
        compression, predictor, rows_per_strip,
        ctypes.byref(out), ctypes.byref(outlen))
    if rc != 0:
        raise RuntimeError(f"oracle tiff float encode failed rc={rc}")
    data = ctypes.string_at(out, outlen.value)
    L.oracle_free(out)
    return data


def tiff_encode_jpeg(pix: np.ndarray, quality: int = 90, tile_size: int = 0,
                     rows_per_strip: int = 0) -> bytes:
    """New-style JPEG-in-TIFF (compression 7), YCbCr photometric for RGB."""
    L = lib()
    if pix.ndim == 2:
        pix = pix[:, :, None]
    h, w, ch = pix.shape
    body = np.ascontiguousarray(pix, np.uint8).tobytes()
    out = c_u8p()
    outlen = ctypes.c_size_t()
    rc = L.oracle_tiff_encode_jpeg(body, w, h, ch, quality, tile_size,
                                   rows_per_strip, ctypes.byref(out),
                                   ctypes.byref(outlen))
    if rc != 0:
        raise RuntimeError(f"oracle tiff jpeg encode failed rc={rc}")
    data = ctypes.string_at(out, outlen.value)
    L.oracle_free(out)
    return data


def tiff_decode(data: bytes) -> np.ndarray:
    L = lib()
    out = c_u8p()
    w = ctypes.c_int(); h = ctypes.c_int(); ch = ctypes.c_int(); bd = ctypes.c_int()
    rc = L.oracle_tiff_decode(data, len(data), ctypes.byref(out), ctypes.byref(w),
                              ctypes.byref(h), ctypes.byref(ch), ctypes.byref(bd))
    if rc != 0:
        raise RuntimeError(f"oracle tiff decode failed rc={rc}")
    nbytes = w.value * h.value * ch.value * (bd.value // 8)
    raw = ctypes.string_at(out, nbytes)
    L.oracle_free(out)
    dtype = np.uint16 if bd.value == 16 else np.uint8
    arr = np.frombuffer(raw, dtype).reshape(h.value, w.value, ch.value)
    return arr[:, :, 0] if ch.value == 1 else arr
