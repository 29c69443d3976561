"""Animated WebP: native ANIM/ANMF container decode + mux encode.

Oracle: libwebpdemux's WebPAnimDecoder (composited RGBA canvas frames) —
an independent implementation of the WebP container spec's compositing
model. The reference tops out at stills (src/parsers/webp.cpp VP8X
animation flag; cv::imdecode in extensions/opencv/opencv_decoder.cpp),
so full-timeline decode exceeds it; the plugin's first-frame behavior is
the cv::imdecode analog.
"""
import struct

import numpy as np
import pytest

from util import make_photo

import nvimagecodec_tpu as nic
from nvimagecodec_tpu.codecs.webp import _riff_chunks, encode_webp_lossless
from nvimagecodec_tpu.codecs.webp_anim import (decode_webp_animation,
                                               encode_webp_animation)


def _oracle():
    try:
        import oracle

        oracle.lib()
        return oracle
    except Exception:
        return None


def _chunk(tag, body):
    return tag + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) & 1 else b"")


def _anmf(x, y, img_rgba, dur=50, blend=False, dispose=False):
    """Hand-build one ANMF with a lossless sub-frame at (x, y)."""
    h, w = img_rgba.shape[:2]
    still = encode_webp_lossless(img_rgba)
    payload = b""
    for tag, body in _riff_chunks(still):
        if tag in (b"ALPH", b"VP8 ", b"VP8L"):
            payload += _chunk(tag, bytes(body))
    flags = (0 if blend else 2) | (1 if dispose else 0)
    hdr = (struct.pack("<I", x // 2)[:3] + struct.pack("<I", y // 2)[:3]
           + struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3]
           + struct.pack("<I", dur)[:3] + bytes([flags]))
    return _chunk(b"ANMF", hdr + payload)


def _container(W, H, anmfs, loop=0):
    vp8x = bytes([0x12, 0, 0, 0]) + struct.pack("<I", W - 1)[:3] \
        + struct.pack("<I", H - 1)[:3]
    body = _chunk(b"VP8X", vp8x)
    body += _chunk(b"ANIM", bytes([0, 0, 0, 0]) + struct.pack("<H", loop))
    for a in anmfs:
        body += a
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def test_mux_roundtrip_lossless_bit_exact():
    frames = [make_photo(40, 55, seed=s) for s in (1, 2)]
    a = (make_photo(40, 55, seed=3, channels=1) // 2 + 100).reshape(40, 55)
    frames.append(np.dstack([make_photo(40, 55, seed=4), a]))
    data = encode_webp_animation(frames, durations_ms=[40, 60, 80], loop=3)
    ours, durs, loop = decode_webp_animation(data)
    assert durs == [40, 60, 80] and loop == 3
    for f, orig in zip(ours, frames):
        orig4 = (orig if orig.shape[-1] == 4
                 else np.dstack([orig, np.full(orig.shape[:2], 255,
                                               np.uint8)]))
        assert np.array_equal(f, orig4)


def test_mux_roundtrip_matches_libwebp_oracle():
    orc = _oracle()
    if orc is None:
        pytest.skip("oracle unavailable")
    frames = [make_photo(33, 47, seed=s) for s in (5, 6, 7)]
    data = encode_webp_animation(frames, durations_ms=25)
    ours, durs, _ = decode_webp_animation(data)
    theirs, odurs = orc.webp_anim_decode(data)
    assert odurs == durs
    for m, o in zip(ours, theirs):
        assert np.array_equal(m, o)


def test_subrect_blend_dispose_matches_oracle():
    """Frames at offsets exercising all four blend × dispose combos must
    composit exactly like libwebp's WebPAnimDecoder."""
    orc = _oracle()
    if orc is None:
        pytest.skip("oracle unavailable")
    base = np.dstack([make_photo(48, 64, seed=8),
                      np.full((48, 64), 255, np.uint8)])
    tr = make_photo(20, 24, seed=9)
    semi = np.dstack([tr, (make_photo(20, 24, seed=10, channels=1)
                           .reshape(20, 24) | 1)])
    data = _container(64, 48, [
        _anmf(0, 0, base, blend=False, dispose=False),
        _anmf(8, 4, semi, blend=True, dispose=False),
        _anmf(32, 16, semi, blend=True, dispose=True),
        _anmf(16, 24, semi, blend=False, dispose=True),
        _anmf(0, 0, semi, blend=True, dispose=False),
    ])
    ours, _, _ = decode_webp_animation(data)
    theirs, _ = orc.webp_anim_decode(data)
    assert len(ours) == len(theirs) == 5
    for i, (m, o) in enumerate(zip(ours, theirs)):
        assert np.array_equal(m, o), f"frame {i} diverges from libwebp"


def test_dense_random_alpha_blend_bit_exact():
    """Full-canvas blend over dense random RGBA (alphas spanning 0..255
    incl. the 0/255 fast paths) must match WebPAnimDecoder bit-exactly —
    this pins the exact integer blend arithmetic, not just the formula
    shape."""
    orc = _oracle()
    if orc is None:
        pytest.skip("oracle unavailable")
    rng = np.random.default_rng(42)
    H, W = 96, 128
    base = rng.integers(0, 256, (H, W, 4)).astype(np.uint8)
    sub = rng.integers(0, 256, (H, W, 4)).astype(np.uint8)
    sub[..., 3] = np.where(rng.random((H, W)) < 0.2, 0, sub[..., 3])
    sub[..., 3] = np.where(rng.random((H, W)) < 0.2, 255, sub[..., 3])
    data = _container(W, H, [_anmf(0, 0, base),
                             _anmf(0, 0, sub, blend=True)])
    ours, _, _ = decode_webp_animation(data)
    theirs, _ = orc.webp_anim_decode(data)
    for m, o in zip(ours, theirs):
        assert np.array_equal(m, o)


def test_lossy_frames_roundtrip():
    """VP8 (lossy) ANMF payloads decode through the native VP8 decoder."""
    frames = [make_photo(32, 48, seed=s) for s in (11, 12)]
    data = encode_webp_animation(frames, lossless=False, quality=90)
    ours, _, _ = decode_webp_animation(data)
    assert len(ours) == 2
    for f, orig in zip(ours, frames):
        assert f.shape == (32, 48, 4)
        assert (f[..., 3] == 255).all()
        mse = np.mean((f[..., :3].astype(np.float64) - orig) ** 2)
        assert 10 * np.log10(255.0**2 / mse) > 30.0
    orc = _oracle()
    if orc is not None:
        theirs, _ = orc.webp_anim_decode(data)
        for m, o in zip(ours, theirs):
            assert np.array_equal(m, o)


def test_decoder_api_returns_first_frame():
    frames = [make_photo(30, 40, seed=s) for s in (13, 14)]
    data = encode_webp_animation(frames)
    out = nic.Decoder().decode(data)
    assert out is not None
    assert np.array_equal(np.asarray(out), frames[0])


def test_parser_reports_canvas_dims():
    data = encode_webp_animation([make_photo(30, 40, seed=15)])
    info = nic.CodeStream(data).get_image_info()
    assert (info.height, info.width) == (30, 40)


def test_truncated_animation_fails_cleanly():
    data = bytearray(encode_webp_animation(
        [make_photo(30, 40, seed=16)] * 2))
    out = nic.Decoder().decode(bytes(data[: len(data) // 2]))
    if out is not None:
        assert np.asarray(out).shape[:2] == (30, 40)
