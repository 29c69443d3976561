"""CMYK/YCCK (Adobe APP14) and EXIF-orientation JPEG decode paths, using
hand-crafted streams (libjpeg's cjpeg cannot produce these from RGB input).

Reference coverage analog: Adobe transform handling in
src/parsers/jpeg.cpp (APP14 → CMYK/YCCK) and EXIF rotation variants in
resources/*/exif_orientation + python decoder EXIF handling."""
import struct

import numpy as np
import pytest

from util import make_photo

import nvimagecodec_tpu as nic
from nvimagecodec_tpu.codecs.jpeg.encode import (
    HuffTable,
    STD_AC_LUMA,
    STD_DC_LUMA,
    build_encode_frame,
    encode_pixels,
    entropy_encode_py,
    write_jpeg,
)
from nvimagecodec_tpu.codecs.jpeg.headers import Component, JpegFrame
from nvimagecodec_tpu.codecs.jpeg.tables import quality_scaled_quant, STD_LUMA_QUANT
from nvimagecodec_tpu.core.types import Orientation


def _encode_4comp(planes: np.ndarray, adobe_transform: int) -> bytes:
    """Encode a [H, W, 4] image as a 4-component JPEG with an Adobe APP14
    marker (transform 0 = CMYK, 2 = YCCK)."""
    h, w = planes.shape[:2]
    frame = JpegFrame(
        0xC0, 8, h, w,
        [Component(i + 1, 1, 1, 0) for i in range(4)],
    )
    frame.quant = {0: quality_scaled_quant(STD_LUMA_QUANT, 95)}
    for c in frame.components:
        c.dc_tbl = c.ac_tbl = 0

    # per-channel fDCT via the gray pixel stage
    from nvimagecodec_tpu.core.types import ChromaSubsampling

    coefs = []
    for ch in range(4):
        f1 = build_encode_frame(h, w, 1, 95, ChromaSubsampling.GRAY)
        f1.quant = {0: frame.quant[0]}
        coefs.append(np.asarray(encode_pixels(planes[..., ch], f1)[0]))

    std = lambda t: HuffTable(list(t[0][1:]), list(t[1]))
    dc = {0: std(STD_DC_LUMA)}
    ac = {0: std(STD_AC_LUMA)}
    entropy = entropy_encode_py(frame, coefs, dc, ac)
    data = write_jpeg(frame, entropy, dc, ac)
    # splice an Adobe APP14 segment right after SOI
    app14 = b"Adobe" + struct.pack(">HHHB", 100, 0, 0, adobe_transform)
    seg = bytes([0xFF, 0xEE]) + (len(app14) + 2).to_bytes(2, "big") + app14
    return data[:2] + seg + data[2:]


def test_cmyk_decode():
    rng = np.random.default_rng(0)
    cmyk = rng.integers(0, 256, (32, 40, 4)).astype(np.uint8)
    # smooth it so quantization error stays small
    cmyk = (cmyk // 8 * 8).astype(np.uint8)
    data = _encode_4comp(cmyk, adobe_transform=0)
    info = nic.CodeStream(data).get_image_info()
    assert info.num_planes == 4
    assert info.color_spec == nic.ColorSpec.CMYK
    out = np.asarray(nic.Decoder().decode(data))
    # default output converts CMYK → RGB (R = C*K/255 convention)
    assert out.shape == (32, 40, 3)
    c, m, y, k = (cmyk[..., i].astype(np.int64) for i in range(4))
    expect_r = (c * k + 127) // 255
    assert np.abs(out[..., 0].astype(int) - expect_r).max() <= 16


def test_ycck_detection():
    rng = np.random.default_rng(1)
    ycck = rng.integers(0, 256, (24, 32, 4)).astype(np.uint8)
    data = _encode_4comp(ycck, adobe_transform=2)
    info = nic.CodeStream(data).get_image_info()
    assert info.color_spec == nic.ColorSpec.YCCK
    out = nic.Decoder().decode(data)
    assert out is not None and np.asarray(out).shape == (24, 32, 3)


def _with_exif_orientation(jpeg: bytes, orientation: int) -> bytes:
    """Splice a minimal EXIF APP1 (TIFF header + orientation tag) after SOI."""
    tiff = (
        b"II*\x00" + struct.pack("<I", 8)
        + struct.pack("<H", 1)
        + struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0)
        + struct.pack("<I", 0)
    )
    body = b"Exif\x00\x00" + tiff
    seg = bytes([0xFF, 0xE1]) + (len(body) + 2).to_bytes(2, "big") + body
    return jpeg[:2] + seg + jpeg[2:]


@pytest.mark.parametrize("orient,expected_shape", [
    (1, (30, 44, 3)),   # normal
    (3, (30, 44, 3)),   # rotate 180
    (6, (44, 30, 3)),   # rotate 90 CW (stored rotated; upright swaps dims)
    (8, (44, 30, 3)),   # rotate 270 CW
])
def test_exif_orientation_applied(orient, expected_shape):
    import oracle

    img = make_photo(30, 44, seed=2)
    data = _with_exif_orientation(oracle.jpeg_encode(img, 95, "444"), orient)
    info = nic.CodeStream(data).get_image_info()
    assert info.orientation == Orientation(orient)
    out = np.asarray(nic.Decoder().decode(data))
    assert out.shape == expected_shape
    base = np.asarray(nic.Decoder().decode(
        data, nic.DecodeParams(apply_exif_orientation=False)))
    assert base.shape == (30, 44, 3)
    if orient == 3:
        assert np.array_equal(out, base[::-1, ::-1])
    elif orient == 6:
        assert np.array_equal(out, np.flip(np.swapaxes(base, 0, 1), axis=1))
    elif orient == 8:
        assert np.array_equal(out, np.flip(np.swapaxes(base, 0, 1), axis=0))


def test_color_spec_routing():
    """DecodeParams.color_spec: GRAY → luma output; UNCHANGED keeps the
    native channel count (reference: python/decoder.cpp:156-225)."""
    import oracle

    img = make_photo(30, 40, seed=6)
    data = oracle.jpeg_encode(img, 92, "444")
    dec = nic.Decoder()
    # GRAY routing
    g = np.asarray(dec.decode(data, nic.DecodeParams(color_spec=nic.ColorSpec.GRAY)))
    assert g.ndim == 2 and g.shape == (30, 40)
    rgb = np.asarray(dec.decode(data)).astype(np.int64)
    luma = (19595 * rgb[..., 0] + 38470 * rgb[..., 1] + 7471 * rgb[..., 2] + 32768) >> 16
    assert np.array_equal(g, luma.astype(np.uint8))
    # UNCHANGED keeps CMYK 4-channel
    cmyk = (np.random.default_rng(0).integers(0, 256, (24, 32, 4)) // 8 * 8).astype(np.uint8)
    d4 = _encode_4comp(cmyk, adobe_transform=0)
    out4 = np.asarray(dec.decode(d4, nic.DecodeParams(color_spec=nic.ColorSpec.UNCHANGED)))
    assert out4.shape[-1] == 4
    out3 = np.asarray(dec.decode(d4))
    assert out3.shape[-1] == 3  # default still converts
