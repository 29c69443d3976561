"""Host glue for the on-device (Pallas) JPEG entropy decoder.

The host's only jobs: split each scan at its restart markers into the
column-packed word matrix (one native pass, tic_jpeg_split_segments) and
reassemble the kernel's [NBLK, 64, S] zigzag block output into per-component
[B, bh, bw, 64] stacks with static reshapes/transposes that XLA fuses into
the IDCT. Wire bytes: the raw destuffed bitstream (~50 KB/image) instead of
coefficient planes (~330 KB packed / 590 KB wide).

Requirements (checked per bucket; anything else routes back to the host
entropy stage): baseline 8-bit single interleaved scan, restart interval a
multiple of the MCU-row width, h/v <= 2.
"""
from __future__ import annotations

import ctypes
import functools
from typing import Dict, List, Optional, Tuple

import numpy as np

from ...ops.pallas_entropy import decode_segments_device, entropy_kernel_spec
from .headers import JpegFrame


def device_entropy_key(frame: JpegFrame):
    """Extended bucket key: geometry + DRI + scan/table content (the kernel
    bakes the Huffman tables as constants)."""
    from .pixel import geometry_key

    try:
        R, comp_map, tables, total = entropy_kernel_spec(frame)
    except ValueError:
        return None
    mcus_x = -(-frame.width // (8 * frame.hmax))
    if R % mcus_x != 0:
        return None  # need whole-MCU-row segments for the static reassembly
    return (geometry_key(frame), R, comp_map, tables)


def device_entropy_plan(frame: JpegFrame):
    """Route description for the on-device entropy decoder, or None when
    the stream must take the host path. Returns (kind, key, R, nsegs):

    - kind "dri": the stream has restart markers — segments are the restart
      intervals, byte-aligned, DC predictors reset (T.81 §F.2.1.3).
    - kind "idx": baseline stream WITHOUT restart markers — the host index
      scan (tic_jpeg_index_scan) finds MCU-row split bits + DC predictor
      seeds, so the kernel still decodes one MCU row per lane. This is the
      TPU answer to the reference needing its HW engine for entropy
      (extensions/nvjpeg/hw_decoder.cpp:349-404): no special bitstream
      required.

    Memoized on the frame object — the batch router calls this per sample.
    """
    p = getattr(frame, "_de_plan", False)
    if p is not False:
        return p
    p = _device_entropy_plan_uncached(frame)
    frame._de_plan = p
    return p


def _device_entropy_plan_uncached(frame: JpegFrame):
    mcus_x = -(-frame.width // (8 * frame.hmax))
    mcus_y = -(-frame.height // (8 * frame.vmax))
    if frame.restart_interval > 0:
        key = device_entropy_key(frame)
        if key is None:
            return None
        nsegs, _ = frame_segments(frame)
        return ("dri", key, frame.restart_interval, nsegs)
    R = mcus_x  # one MCU row per segment: max lane parallelism, min W
    try:
        spec = entropy_kernel_spec(frame, R)
    except ValueError:
        return None
    from .pixel import geometry_key

    return ("idx", (geometry_key(frame), R, spec[1], spec[2]), R, mcus_y)


def frame_segments(frame: JpegFrame) -> Tuple[int, int]:
    """(nsegs, total_mcus) for one frame."""
    R = frame.restart_interval
    mcus_x = -(-frame.width // (8 * frame.hmax))
    mcus_y = -(-frame.height // (8 * frame.vmax))
    total = mcus_x * mcus_y
    return -(-total // R), total


def split_batch_segments(frames: List[JpegFrame], raws: List[bytes],
                         max_words: int, lanes: Optional[int] = None,
                         words: Optional[np.ndarray] = None):
    """Pack every sample's restart segments into one [W, S] uint32 column
    matrix (S = `lanes`, or B*nsegs rounded up to 128). Returns (words,
    seg_mcus, nsegs, bad) — bad is the list of sample positions whose scan
    did not split into the expected segment count (host-path fallback) —
    or None if a segment exceeds max_words (caller grows and retries).
    `words` may be a recycled buffer (stale pad columns are dead lanes)."""
    from ...native import lib

    L = lib()
    f0 = frames[0]
    R = f0.restart_interval
    nsegs, total = frame_segments(f0)
    B = len(frames)
    S = lanes if lanes is not None else -((-B * nsegs) // 128) * 128
    if words is None:
        words = np.zeros((max_words, S), np.uint32)
    seg_mcus = np.zeros(S, np.int32)
    bad: List[int] = []
    for i, (fr, raw) in enumerate(zip(frames, raws)):
        scan = fr.scans[0]
        data = raw[scan.data_start:scan.data_end]
        n = L.tic_jpeg_split_segments(
            data, len(data),
            words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            S, i * nsegs, nsegs, max_words,
        )
        if n == -1:
            return None  # capacity: caller retries with a larger max_words
        if n != nsegs:
            bad.append(i)  # malformed restart structure: host path
            seg_mcus[i * nsegs:(i + 1) * nsegs] = 0
            continue
        col = i * nsegs
        seg_mcus[col:col + nsegs] = R
        seg_mcus[col + nsegs - 1] = total - (nsegs - 1) * R
    return words, seg_mcus, nsegs, bad


def index_scan_image(frame: JpegFrame, raw: bytes, rows_per_seg: int,
                     nsegs: int):
    """Host index scan for one image: destuffed scan bytes + per-segment
    (bit offset, DC predictor seeds). Returns (destuffed, dlen, bits[nsegs]
    int64, preds[nsegs, 4] int32) or None (host path)."""
    from ...native import lib

    L = lib()
    scan = frame.scans[0]
    cap = int(scan.data_end - scan.data_start) + 8
    dst = np.empty(cap, np.uint8)
    bits = np.empty(nsegs + 1, np.int64)
    preds = np.empty((nsegs + 1) * 4, np.int32)
    dlen = ctypes.c_int64(0)
    n = L.tic_jpeg_index_scan(
        raw, len(raw), rows_per_seg,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        ctypes.byref(dlen),
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        preds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nsegs + 1,
    )
    if n != nsegs:
        return None
    return dst, int(dlen.value), bits[:n], preds[:n * 4].reshape(n, 4)


def index_scan_batch(frames, raws, idxs, rows_per_seg: int, nsegs: int,
                     nthreads: int):
    """Batched host index scan: every image of a geometry bucket in one
    native call (native/jpeg_entropy.cpp tic_jpeg_index_scan_batch) with
    internal work-stealing threads — replaces the per-image ctypes +
    thread-pool round trip. Returns {i: (destuffed, dlen, bits, preds)}
    with None entries for images the scanner declined."""
    from ...native import lib

    L = lib()
    n = len(idxs)
    if n == 0:
        return {}
    max_segs = nsegs + 1
    datas = (ctypes.c_char_p * n)(*[raws[i] for i in idxs])
    lens = np.asarray([len(raws[i]) for i in idxs], np.int64)
    offs = np.zeros(n + 1, np.int64)
    for k, i in enumerate(idxs):
        sc = frames[i].scans[0]
        offs[k + 1] = offs[k] + int(sc.data_end - sc.data_start) + 8
    arena = np.empty(int(offs[-1]), np.uint8)
    dlens = np.zeros(n, np.int64)
    bits = np.zeros((n, max_segs), np.int64)
    preds = np.zeros((n, max_segs * 4), np.int32)
    nout = np.zeros(n, np.int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    L.tic_jpeg_index_scan_batch(
        n, datas, lens.ctypes.data_as(i64p), rows_per_seg,
        arena.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offs.ctypes.data_as(i64p), dlens.ctypes.data_as(i64p),
        bits.ctypes.data_as(i64p), preds.ctypes.data_as(i32p),
        max_segs, nout.ctypes.data_as(i32p), nthreads)
    out = {}
    for k, i in enumerate(idxs):
        if nout[k] != nsegs:
            out[i] = None
            continue
        m = int(nout[k])
        out[i] = (arena[offs[k]:offs[k + 1]], int(dlens[k]),
                  bits[k, :m], preds[k, :m * 4].reshape(m, 4))
    return out, (arena, offs, dlens, bits, preds, nout)


def pack_indexed_batch(arena, offs, dlens, bits, ks, nsegs: int,
                       words: np.ndarray, max_words: int,
                       start_bits: np.ndarray, nthreads: int):
    """Pack sub-bucket images (rows ks of the scan-batch arrays) into the
    [W, S] matrix in one native call. Returns the list of sub-local j
    indices whose segments overflowed max_words."""
    from ...native import lib

    L = lib()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p_ = ctypes.POINTER(ctypes.c_int64)
    i32p_ = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    # int64 scalar params MUST be declared: the default c_int conversion
    # leaves the upper register half undefined for int64_t callees
    L.tic_jpeg_pack_indexed_batch.argtypes = [
        ctypes.c_int32, u8p, i64p_, i64p_, i64p_, ctypes.c_int32,
        ctypes.c_int32, u32p, ctypes.c_int64, ctypes.c_int32, i32p_,
        i32p_, ctypes.c_int32]
    n = len(ks)
    max_segs = bits.shape[1]
    offs_sub = np.ascontiguousarray(offs[ks], np.int64)
    dlens_sub = np.ascontiguousarray(dlens[ks], np.int64)
    bits_sub = np.ascontiguousarray(bits[ks])
    rcs = np.zeros(n, np.int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    L.tic_jpeg_pack_indexed_batch(
        n, arena.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offs_sub.ctypes.data_as(i64p), dlens_sub.ctypes.data_as(i64p),
        bits_sub.ctypes.data_as(i64p), max_segs, nsegs,
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        words.shape[1], max_words,
        start_bits.ctypes.data_as(i32p), rcs.ctypes.data_as(i32p),
        nthreads)
    return [int(j) for j in np.flatnonzero(rcs)]


def indexed_words_needed_batch(dlens: np.ndarray, bits: np.ndarray,
                               nsegs: int) -> int:
    """Vectorized max words-per-segment over scan-batch rows (valid rows
    only — caller pre-selects)."""
    end_bits = np.empty_like(bits[:, :nsegs])
    end_bits[:, :-1] = bits[:, 1:nsegs]
    end_bits[:, -1] = dlens * 8
    w0 = bits[:, :nsegs] // 32
    w1 = np.minimum((end_bits + 96 + 31) // 32,
                    ((dlens + 3) // 4)[:, None])
    return int(np.maximum(w1 - w0, 1).max()) if len(dlens) else 1


def indexed_words_needed(dlen: int, bits: np.ndarray) -> int:
    """Max words any segment of this image needs in the [W, S] matrix."""
    end_bits = np.empty_like(bits)
    end_bits[:-1] = bits[1:]
    end_bits[-1] = dlen * 8
    w0 = bits // 32
    w1 = np.minimum((end_bits + 96 + 31) // 32, (dlen + 3) // 4)
    return int(np.maximum(w1 - w0, 1).max())


def pack_indexed_image(destuffed: np.ndarray, dlen: int, bits: np.ndarray,
                       words: np.ndarray, col0: int, max_words: int,
                       start_bits: np.ndarray) -> bool:
    """Pack one index-scanned image's segments into columns col0.. of the
    [W, S] matrix; start_bits[col0:col0+nsegs] receives the bit offsets."""
    from ...native import lib

    L = lib()
    S = words.shape[1]
    sb = start_bits[col0:]
    rc = L.tic_jpeg_pack_indexed(
        destuffed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dlen,
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(bits),
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), S, col0,
        max_words,
        sb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return rc == 0


def reassemble_components(xp, out, frame: JpegFrame, B: int, nsegs: int,
                          R: int = 0):
    """[NBLK, 64, S] kernel output → per-component [B, bh, bw, 64] zigzag
    stacks via static reshapes (runs inside the pixel jit)."""
    if R <= 0:
        R = frame.restart_interval
    mcus_x = -(-frame.width // (8 * frame.hmax))
    mcus_y = -(-frame.height // (8 * frame.vmax))
    rows_per_seg = R // mcus_x
    bpm = sum(c.h * c.v for c in frame.components)
    NBLK = R * bpm
    S = out.shape[2]
    x = out.reshape(rows_per_seg, mcus_x, bpm, 64, S)
    x = x[..., :B * nsegs].reshape(
        rows_per_seg, mcus_x, bpm, 64, B, nsegs)
    coefs = []
    off = 0
    for c in frame.components:
        nb = c.h * c.v
        xc = x[:, :, off:off + nb]  # [rps, mx, v*h, 64, B, nsegs]
        off += nb
        xc = xc.reshape(rows_per_seg, mcus_x, c.v, c.h, 64, B, nsegs)
        # → [B, nsegs, rps, v, mx, h, 64]
        xc = xp.transpose(xc, (5, 6, 0, 2, 1, 3, 4))
        bh_pad = nsegs * rows_per_seg * c.v
        xc = xc.reshape(B, bh_pad, mcus_x * c.h, 64)
        coefs.append(xc[:, :mcus_y * c.v])  # drop short-segment padding rows
    return coefs


def decode_progressive_device(frame: JpegFrame, raw: bytes,
                              interpret: bool = False):
    """Decode a progressive stream (restart markers in every scan)
    entirely with the device entropy kernels — the DC scan, each AC band
    scan AND the successive-approximation refinement scans (Ah>0) are
    restart-parallel (ops/pallas_entropy._build_prog_kernel; the
    reference decodes full progressive on GPU,
    extensions/nvjpeg/cuda_decoder.cpp:75-76). Returns per-component
    ZIGZAG-order [bh, bw, 64] int16 planes (padded MCU grid)."""
    from ...native import lib
    from ...ops.pallas_entropy import (
        decode_prog_scan_device,
        prog_scan_specs,
    )

    scans = prog_scan_specs(frame)
    L = lib()
    mcus_x = -(-frame.width // (8 * frame.hmax))
    mcus_y = -(-frame.height // (8 * frame.vmax))
    coefs = []
    for c in frame.components:
        coefs.append(np.zeros((mcus_y * c.v, mcus_x * c.h, 64), np.int16))

    for scan in scans:
        R = scan.restart_interval
        if scan.ss == 0:
            units_total = mcus_x * mcus_y
            bpm = sum(c.h * c.v for c in frame.components)
        else:
            ci = scan.comp_indices[0]
            c = frame.components[ci]
            tw = (frame.width * c.h + frame.hmax - 1) // frame.hmax
            th = (frame.height * c.v + frame.vmax - 1) // frame.vmax
            cbw = (tw + 7) // 8
            cbh = (th + 7) // 8
            units_total = cbw * cbh
            bpm = 1
        nsegs = -(-units_total // R)
        S = -((-nsegs) // 128) * 128
        data = raw[scan.data_start:scan.data_end]
        max_words = 256
        while True:
            words = np.zeros((max_words, S), np.uint32)
            n = L.tic_jpeg_split_segments(
                data, len(data),
                words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                S, 0, nsegs, max_words)
            if n == -1:
                max_words *= 2
                continue
            if n != nsegs:
                raise ValueError(
                    f"prog device entropy: scan split into {n} segments, "
                    f"expected {nsegs}")
            break
        seg_units = np.zeros(S, np.int32)
        seg_units[:nsegs] = R
        seg_units[nsegs - 1] = units_total - (nsegs - 1) * R
        lanes = np.arange(nsegs)
        band_in = None
        if scan.ss != 0 and scan.ah != 0:
            # AC refinement: ship the CURRENT band state up with the scan
            band_in = np.zeros((R, 64, S), np.int16)
            for m in range(R):
                g = lanes * R + m
                valid = g < units_total
                gv = g[valid]
                band_in[m, :, np.nonzero(valid)[0]] = (
                    coefs[ci][gv // cbw, gv % cbw, :])
        out, err = decode_prog_scan_device(frame, scan, words, seg_units,
                                           interpret, band_in=band_in)
        if int(np.asarray(err)[:nsegs].sum()) != 0:
            raise ValueError("prog device entropy: kernel flagged error")
        out = np.asarray(out)  # [R*bpm, K, S]

        if scan.ss == 0:
            # scatter DC values: per (block-in-mcu), all lanes/mcus at once
            arr = out[:, 0, :nsegs]  # [R*bpm, nsegs]
            off = 0
            for ci2, c in enumerate(frame.components):
                for by in range(c.v):
                    for bx in range(c.h):
                        b = off + by * c.h + bx
                        for m in range(R):
                            g = lanes * R + m
                            valid = g < units_total
                            gv = g[valid]
                            rows = (gv // mcus_x) * c.v + by
                            cols = (gv % mcus_x) * c.h + bx
                            if scan.ah == 0:
                                coefs[ci2][rows, cols, 0] = (
                                    arr[m * bpm + b, valid])
                            else:
                                # refinement: OR bit<<al (T.81 G.1.2.1)
                                coefs[ci2][rows, cols, 0] |= (
                                    arr[m * bpm + b, valid])
                off += c.h * c.v
        else:
            arr = out[:, :, :nsegs]  # [R, 64, nsegs]
            for m in range(R):
                g = lanes * R + m
                valid = g < units_total
                gv = g[valid]
                rows = gv // cbw
                cols = gv % cbw
                coefs[ci][rows, cols, scan.ss:scan.se + 1] = (
                    arr[m, scan.ss:scan.se + 1, :].T[valid])
    return coefs
