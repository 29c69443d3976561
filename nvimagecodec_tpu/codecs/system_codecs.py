"""System-library fallback decoders (ctypes, loaded lazily at runtime).

The architectural analog of the reference's CPU fallback extensions, which
link the very same libraries (reference: extensions/libjpeg_turbo/,
extensions/libtiff/, extensions/opencv/ — all CPU_ONLY, LOW/NORMAL
priority, opencv_ext.cpp:38-44). Our own TPU/CPU implementations register
at higher priority; these only catch what they can't handle yet (e.g. WebP
lossy until the native VP8 path lands). Absent libraries degrade
gracefully — the plugin just doesn't register, like the reference's
plugin-load-failure path (src/plugin_framework.cpp:314-351).
"""
from __future__ import annotations

import ctypes
import ctypes.util
from typing import List, Optional

import numpy as np

from ..core.interfaces import DecodeParams, DecodeResult, DecoderPlugin
from ..core.types import BackendKind, Priority, ProcessingStatus


def _load(*names) -> Optional[ctypes.CDLL]:
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


class WebpSystemDecoder(DecoderPlugin):
    """WebP decode via system libwebp (VP8 + VP8L + alpha/animation-less).

    Mirrors the reference's opencv webp decoder registration
    (extensions/opencv/opencv_ext.cpp:38-44, LOW priority).
    """

    codec = "webp"
    plugin_id = "system_webp_decoder"
    backend_kind = BackendKind.CPU_ONLY
    priority = Priority.LOW

    def __init__(self):
        L = _load("libwebp.so.7", "libwebp.so")
        if L is None:
            raise ImportError("libwebp not available")
        L.WebPGetInfo.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        L.WebPGetInfo.restype = ctypes.c_int
        L.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        L.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        L.WebPFree.argtypes = [ctypes.c_void_p]
        self._L = L

    def can_decode(self, data_batch, info_batch, params) -> List[ProcessingStatus]:
        out = []
        for data in data_batch:
            head = bytes(data[:16])
            ok = head[:4] == b"RIFF" and head[8:12] == b"WEBP"
            out.append(
                ProcessingStatus.SUCCESS
                if ok
                else ProcessingStatus.FAIL | ProcessingStatus.CODEC_UNSUPPORTED
            )
        return out

    def _decode_one(self, data: bytes, params: DecodeParams) -> np.ndarray:
        w = ctypes.c_int()
        h = ctypes.c_int()
        buf = self._L.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
        if not buf:
            raise ValueError("libwebp decode failed")
        try:
            arr = np.ctypeslib.as_array(buf, (h.value * w.value * 4,)).copy()
        finally:
            self._L.WebPFree(buf)
        img = arr.reshape(h.value, w.value, 4)
        # default output drops a fully-opaque alpha plane (the reference's
        # default I_RGB behavior, python/decoder.cpp:156-225)
        if (img[..., 3] == 255).all():
            img = np.ascontiguousarray(img[..., :3])
        return img

    def decode_batch(self, data_batch, info_batch, params) -> List[DecodeResult]:
        out = []
        for data in data_batch:
            try:
                out.append(
                    DecodeResult(
                        ProcessingStatus.SUCCESS,
                        self._decode_one(bytes(data), params),
                    )
                )
            except Exception as e:
                out.append(
                    DecodeResult(
                        ProcessingStatus.FAIL | ProcessingStatus.IMAGE_CORRUPTED,
                        error=str(e),
                    )
                )
        return out


class OpjJpeg2kDecoder(DecoderPlugin):
    """JPEG2000 last-resort fallback via system libopenjp2 for stream
    features the native decoder rejects (subsampled or signed components,
    mixed HT/EBCOT code-block styles). Per-component COC/QCC overrides and
    plain HTJ2K are decoded natively (codestream.py, native/j2k_ht.cpp)
    and never reach this rung.
    The same lowest-rung pattern as the reference's opencv extension; the
    bridge self-validates its hand-declared ABI before registering
    (native/opj_bridge.py)."""

    codec = "jpeg2k"
    plugin_id = "system_openjpeg_decoder"
    backend_kind = BackendKind.CPU_ONLY
    priority = Priority.LOW

    def __init__(self):
        from ..native import opj_bridge

        opj_bridge.lib()  # build + self-validate now; raises if unusable
        self._bridge = opj_bridge

    def can_decode(self, data_batch, info_batch, params) -> List[ProcessingStatus]:
        out = []
        for data in data_batch:
            head = bytes(data[:12])
            ok = head[:4] == b"\xff\x4f\xff\x51" or head[:8] == bytes.fromhex(
                "0000000c6a502020"
            )
            out.append(
                ProcessingStatus.SUCCESS
                if ok
                else ProcessingStatus.FAIL | ProcessingStatus.CODEC_UNSUPPORTED
            )
        return out

    def decode_batch(self, data_batch, info_batch, params) -> List[DecodeResult]:
        out = []
        for data in data_batch:
            try:
                arr, prec, signed = self._bridge.decode(bytes(data))
                if signed:
                    arr = arr + (1 << (prec - 1))
                maxv = (1 << prec) - 1
                arr = np.clip(arr, 0, maxv)
                if prec <= 8:
                    img = arr.astype(np.uint8)
                else:
                    img = arr.astype(np.uint16)
                    if not params.allow_any_depth:
                        img = (img >> (prec - 8)).astype(np.uint8)
                if img.shape[-1] == 1:
                    img = img[..., 0]
                out.append(DecodeResult(ProcessingStatus.SUCCESS, img))
            except Exception as e:
                out.append(
                    DecodeResult(
                        ProcessingStatus.FAIL | ProcessingStatus.IMAGE_CORRUPTED,
                        error=str(e),
                    )
                )
        return out


class TiffSystemDecoder(DecoderPlugin):
    """TIFF last-resort fallback via system libtiff's RGBA reader — covers
    any compression libtiff itself carries (e.g. old-style JPEG variants,
    SGI LogLuv, ThunderScan) that the native TIFF decoder rejects. The
    exact rung the reference's libtiff extension occupies
    (extensions/libtiff/libtiff_decoder.cpp), one step below our native
    strip/tile decoder."""

    codec = "tiff"
    plugin_id = "system_libtiff_decoder"
    backend_kind = BackendKind.CPU_ONLY
    priority = Priority.LOW

    def __init__(self):
        L = _load("libtiff.so.6", "libtiff.so.5", "libtiff.so")
        if L is None:
            raise ImportError("libtiff not available")
        L.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        L.TIFFOpen.restype = ctypes.c_void_p
        L.TIFFClose.argtypes = [ctypes.c_void_p]
        L.TIFFGetField.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        L.TIFFReadRGBAImageOriented.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
        ]
        L.TIFFReadRGBAImageOriented.restype = ctypes.c_int
        L.TIFFSetErrorHandler.argtypes = [ctypes.c_void_p]
        L.TIFFSetWarningHandler.argtypes = [ctypes.c_void_p]
        L.TIFFSetErrorHandler(None)   # quiet: failures surface as rc=0
        L.TIFFSetWarningHandler(None)
        self._L = L

    def can_decode(self, data_batch, info_batch, params) -> List[ProcessingStatus]:
        out = []
        for data in data_batch:
            head = bytes(data[:4])
            ok = head in (b"II*\x00", b"MM\x00*")
            out.append(
                ProcessingStatus.SUCCESS
                if ok
                else ProcessingStatus.FAIL | ProcessingStatus.CODEC_UNSUPPORTED
            )
        return out

    def _decode_one(self, data: bytes) -> np.ndarray:
        import os
        import tempfile

        L = self._L
        fd, path = tempfile.mkstemp(suffix=".tif")
        try:
            os.write(fd, data)
            os.close(fd)
            tif = L.TIFFOpen(path.encode(), b"r")
            if not tif:
                raise ValueError("libtiff cannot open stream")
            try:
                w = ctypes.c_uint32()
                h = ctypes.c_uint32()
                L.TIFFGetField(tif, 256, ctypes.byref(w))  # ImageWidth
                L.TIFFGetField(tif, 257, ctypes.byref(h))  # ImageLength
                if not (w.value and h.value):
                    raise ValueError("libtiff: bad dimensions")
                raster = np.empty(h.value * w.value, np.uint32)
                rc = L.TIFFReadRGBAImageOriented(
                    tif, w.value, h.value,
                    raster.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                    1, 0)  # ORIENTATION_TOPLEFT, stop on error
                if rc != 1:
                    raise ValueError("libtiff RGBA decode failed")
            finally:
                L.TIFFClose(tif)
        finally:
            os.unlink(path)
        rgba = raster.view(np.uint8).reshape(h.value, w.value, 4)
        if np.all(rgba[..., 3] == 255):
            rgb = rgba[..., :3]
            if (np.array_equal(rgb[..., 0], rgb[..., 1])
                    and np.array_equal(rgb[..., 1], rgb[..., 2])):
                return np.ascontiguousarray(rgb[..., 0])
            return np.ascontiguousarray(rgb)
        return np.ascontiguousarray(rgba)

    def decode_batch(self, data_batch, info_batch, params) -> List[DecodeResult]:
        out = []
        for data in data_batch:
            try:
                out.append(
                    DecodeResult(
                        ProcessingStatus.SUCCESS, self._decode_one(bytes(data))
                    )
                )
            except Exception as e:
                out.append(
                    DecodeResult(
                        ProcessingStatus.FAIL | ProcessingStatus.IMAGE_CORRUPTED,
                        error=str(e),
                    )
                )
        return out


def register(registry) -> None:
    try:
        registry.codec("webp").register_decoder(WebpSystemDecoder())
    except ImportError:
        pass
    try:
        registry.codec("jpeg2k").register_decoder(OpjJpeg2kDecoder())
    except Exception:
        pass  # libopenjp2 absent or ABI validation failed
    try:
        registry.codec("tiff").register_decoder(TiffSystemDecoder())
    except Exception:
        pass  # libtiff absent
