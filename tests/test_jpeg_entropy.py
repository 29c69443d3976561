"""Entropy decode bit-exactness vs libjpeg's own coefficient dump
(model: the correctness anchor of SURVEY.md §7 build order step 3)."""
import numpy as np
import pytest

import oracle
from nvimagecodec_tpu.codecs.jpeg.headers import parse_jpeg_structure
from nvimagecodec_tpu.codecs.jpeg.entropy_py import decode_coefficients
from util import make_photo


def check_coefs(data: bytes):
    frame = parse_jpeg_structure(data)
    ours = decode_coefficients(frame, data)
    ref_coefs, ref_quant, ref_samp = oracle.jpeg_read_coefficients(data)
    assert len(ours) == len(ref_coefs)
    for c, (mine, ref) in enumerate(zip(ours, ref_coefs)):
        bh, bw, _ = ref.shape
        # we may cover a larger MCU-padded grid than libjpeg's true-block dims
        assert mine.shape[0] >= bh and mine.shape[1] >= bw, (mine.shape, ref.shape)
        np.testing.assert_array_equal(
            mine[:bh, :bw], ref, err_msg=f"component {c} coefficients differ"
        )
        # quant tables parsed identically (natural order)
        comp = frame.components[c]
        np.testing.assert_array_equal(frame.quant[comp.tq], ref_quant[c])


@pytest.fixture(scope="module")
def small_photo():
    return make_photo(120, 200, seed=11)


@pytest.mark.parametrize("ss", ["444", "422", "420", "440", "411", "410"])
def test_baseline_chroma_matrix(small_photo, ss):
    check_coefs(oracle.jpeg_encode(small_photo, 90, ss))


def test_gray(small_photo):
    check_coefs(oracle.jpeg_encode(small_photo[:, :, 0], 90))


@pytest.mark.parametrize("q", [10, 50, 95, 100])
def test_quality_sweep(small_photo, q):
    check_coefs(oracle.jpeg_encode(small_photo, q, "420"))


def test_restart_intervals(small_photo):
    for ri in (1, 3, 8, 64):
        check_coefs(oracle.jpeg_encode(small_photo, 85, "420", restart_interval=ri))


def test_optimized_huffman(small_photo):
    check_coefs(oracle.jpeg_encode(small_photo, 90, "420", optimize=True))


def test_progressive(small_photo):
    check_coefs(oracle.jpeg_encode(small_photo, 90, "420", progressive=True))


def test_progressive_gray(small_photo):
    check_coefs(oracle.jpeg_encode(small_photo[:, :, 0], 90, progressive=True))


def test_progressive_restart(small_photo):
    check_coefs(
        oracle.jpeg_encode(small_photo, 90, "422", progressive=True, restart_interval=4)
    )


def test_odd_dimensions():
    for h, w in [(17, 31), (8, 8), (9, 9), (64, 1), (1, 64)]:
        img = make_photo(h, w, seed=h * 100 + w)
        check_coefs(oracle.jpeg_encode(img, 90, "420"))
        check_coefs(oracle.jpeg_encode(img, 90, "444"))


class TestNativeParity:
    """Native C++ entropy decoder must match the Python reference and the
    oracle on every stream class."""

    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(quality=90, subsamp="420"),
            dict(quality=90, subsamp="444"),
            dict(quality=85, subsamp="422", progressive=True),
            dict(quality=85, subsamp="420", restart_interval=5),
            dict(quality=90, subsamp="411", optimize=True),
            dict(quality=90, subsamp="440", progressive=True, restart_interval=3),
        ],
    )
    def test_native_matches_python(self, small_photo, kwargs):
        from nvimagecodec_tpu.codecs.jpeg.native import decode_coefficients_native

        data = oracle.jpeg_encode(small_photo, **kwargs)
        frame = parse_jpeg_structure(data)
        py = decode_coefficients(frame, data)
        nat = decode_coefficients_native(frame, data)
        assert len(py) == len(nat)
        for a, b in zip(py, nat):
            np.testing.assert_array_equal(a, b)


def test_progressive_packs_onto_wire():
    """Progressive streams reach the packed wire via the post-decode pack
    pass (VERDICT r2 item 9): native wide decode + tic_jpeg_pack_coefficients
    reproduces the direct packed encode of an equivalent baseline stream."""
    import numpy as np
    from util import make_photo
    import oracle
    from nvimagecodec_tpu.codecs.jpeg.headers import parse_jpeg_structure
    from nvimagecodec_tpu.codecs.jpeg.native import (
        decode_coefficients_into, pack_coefficients_into)

    img = make_photo(96, 144, seed=77)
    data = oracle.jpeg_encode(img, 85, "420", progressive=True)
    frame = parse_jpeg_structure(data)
    _, _, dims = frame.mcu_geometry()
    scratch = [np.empty((bh, bw, 64), np.int16) for (bw, bh) in dims]
    decode_coefficients_into(frame, data, scratch)
    for c, (bw, bh) in enumerate(dims):
        lo = np.zeros((bh, bw, 64), np.uint8)
        hi = np.zeros((bh, bw, 8), np.int8)
        assert pack_coefficients_into(scratch[c], lo, hi)
        # reconstruct int16 from the wire and compare (zigzag order)
        zz = np.array([0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4,
                       5, 12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7,
                       14, 21, 28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22,
                       15, 23, 30, 37, 44, 51, 58, 59, 52, 45, 38, 31, 39,
                       46, 53, 60, 61, 54, 47, 55, 62, 63])
        rec = lo.astype(np.int16).copy()
        rec[:, :, 8:] = lo[:, :, 8:].view(np.int8)  # tail: sign-extend int8
        rec[:, :, :8] = (hi.astype(np.int16) << 8) | lo[:, :, :8]
        nat = np.zeros_like(rec)
        nat[:, :, zz] = rec
        assert np.array_equal(nat, scratch[c])


def test_progressive_batch_decode_via_packed_wire(monkeypatch):
    """End to end: a progressive batch decodes correctly with the packed
    wire enabled, and the truncation-level memo settles below 'wide'."""
    import numpy as np
    from util import make_photo, max_abs_diff
    import oracle
    import nvimagecodec_tpu as nic
    from nvimagecodec_tpu.codecs.jpeg import batch as jb

    img = make_photo(120, 200, seed=78)
    data = oracle.jpeg_encode(img, 85, "420", progressive=True)
    out = nic.Decoder().decode([data, data, data])
    for o in out:
        assert o is not None and max_abs_diff(np.asarray(o), oracle.jpeg_decode(data)) <= 4
