"""Arithmetic-coded JPEG (T.81 Annex K) decode tests — coefficients
bit-exact vs libjpeg (the oracle both encodes and ground-truth decodes),
pixels within the reference's lossy tolerance.

Reference analog: the CPU fallbacks route arithmetic streams through
libjpeg (extensions/libjpeg_turbo/); here the QM-coder decoder is native
(native/jpeg_arith.cpp)."""
import numpy as np
import pytest

from util import make_photo

oracle = pytest.importorskip("oracle")

from nvimagecodec_tpu.codecs.jpeg.headers import parse_jpeg_structure  # noqa: E402
from nvimagecodec_tpu.codecs.jpeg.native import (  # noqa: E402
    decode_coefficients_arith,
    is_arith,
)


@pytest.fixture(scope="module")
def img():
    return make_photo(67, 93, seed=4)


def _arith_stream(img, **kw):
    try:
        return oracle.jpeg_encode_arith(img, **kw)
    except RuntimeError:
        pytest.skip("libjpeg built without arithmetic coding")


@pytest.mark.parametrize(
    "kw",
    [
        dict(quality=90, subsamp="420"),
        dict(quality=85, subsamp="444"),
        dict(quality=95, subsamp="422"),
        dict(quality=90, subsamp="411"),
        dict(quality=90, subsamp="420", restart_interval=3),
        dict(quality=90, subsamp="420", progressive=True),
        dict(quality=95, subsamp="444", progressive=True),
        dict(quality=90, subsamp="444", progressive=True, restart_interval=2),
    ],
)
def test_coefficients_bit_exact(img, kw):
    data = _arith_stream(img, **kw)
    frame = parse_jpeg_structure(data)
    assert is_arith(frame)
    got = decode_coefficients_arith(frame, data)
    truth = oracle.jpeg_read_coefficients(data)[0]
    for g, t in zip(got, truth):
        th, tw = t.shape[:2]
        assert np.array_equal(g[:th, :tw], t)


def test_gray_bit_exact(img):
    data = _arith_stream(img[..., 0], quality=90)
    frame = parse_jpeg_structure(data)
    got = decode_coefficients_arith(frame, data)
    truth = oracle.jpeg_read_coefficients(data)[0]
    assert np.array_equal(got[0][: truth[0].shape[0]], truth[0])


def test_public_api(img):
    import nvimagecodec_tpu as nic

    dec = nic.Decoder()
    for kw in (dict(quality=90, subsamp="420"),
               dict(quality=90, subsamp="444", progressive=True)):
        data = _arith_stream(img, **kw)
        info = nic.CodeStream(data).get_image_info()
        assert info.jpeg_encoding in (
            nic.JpegEncoding.EXTENDED_SEQUENTIAL_DCT_ARITHMETIC,
            nic.JpegEncoding.PROGRESSIVE_DCT_ARITHMETIC,
        )
        out = np.asarray(dec.decode(data))
        truth = oracle.jpeg_decode(data)
        assert np.abs(out.astype(int) - truth.astype(int)).max() <= 4


def test_batch_mixed_with_huffman(img):
    import nvimagecodec_tpu as nic

    dec = nic.Decoder()
    batch = [
        _arith_stream(img, quality=90, subsamp="420"),
        oracle.jpeg_encode(img, 90, "420"),
        _arith_stream(img, quality=90, subsamp="420", progressive=True),
    ]
    outs = dec.decode(batch)
    for o in outs:
        assert o is not None and np.asarray(o).shape == img.shape


def test_truncated_stream_fails_cleanly(img):
    import nvimagecodec_tpu as nic

    data = _arith_stream(img, quality=90, subsamp="420")
    # cut inside the entropy segment: either a clean per-sample failure or
    # a degraded image of the right shape (the QM decoder feeds zero bytes
    # past the end — libjpeg's behavior as well); never a crash
    out = nic.Decoder().decode([data[: len(data) // 2]])
    assert out[0] is None or np.asarray(out[0]).shape == img.shape
    # cut inside the header: must be a clean failure
    out = nic.Decoder().decode([data[:20]])
    assert out[0] is None
