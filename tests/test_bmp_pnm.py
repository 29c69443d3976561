"""End-to-end slice: BMP decode + PNM encode roundtrip (BASELINE configs[0]).

The reference validates this path with MD5-pinned transcode goldens
(test/test_transcode.py); without the LFS corpus we pin correctness with
hand-built containers + lossless roundtrips through independent encoders.
"""
import struct

import numpy as np
import pytest

from nvimagecodec_tpu import Decoder, Encoder
from nvimagecodec_tpu.codecs.bmp import decode_bmp, encode_bmp
from nvimagecodec_tpu.codecs.pnm import decode_pnm, encode_pnm


def make_bmp_24(img: np.ndarray) -> bytes:
    """Independent hand-rolled 24bpp writer (bottom-up, BGR, padded rows)."""
    h, w, _ = img.shape
    row = (w * 3 + 3) // 4 * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        line = bytearray()
        for x in range(w):
            r, g, b = img[y, x]
            line += bytes([b, g, r])
        line += b"\x00" * (row - len(line))
        body += line
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return hdr + dib + bytes(body)


class TestBmpDecode:
    def test_hand_built_24bpp(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (5, 3, 3), np.uint8)
        out = decode_bmp(memoryview(make_bmp_24(img)))
        np.testing.assert_array_equal(out, img)

    def test_odd_width_padding(self):
        rng = np.random.default_rng(4)
        for w in (1, 2, 3, 5, 7):
            img = rng.integers(0, 256, (4, w, 3), np.uint8)
            np.testing.assert_array_equal(decode_bmp(memoryview(make_bmp_24(img))), img)

    def test_roundtrip_rgb(self, photo):
        np.testing.assert_array_equal(decode_bmp(memoryview(encode_bmp(photo))), photo)

    def test_roundtrip_gray(self, photo_gray):
        np.testing.assert_array_equal(
            decode_bmp(memoryview(encode_bmp(photo_gray))), photo_gray
        )

    def test_api_decode(self, corpus, photo):
        img = Decoder().decode(str(corpus / "bmp" / "photo.bmp"))
        assert img is not None
        np.testing.assert_array_equal(np.asarray(img), photo)


class TestPnm:
    def test_hand_built_p6(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (3, 4, 3), np.uint8)
        data = b"P6\n4 3\n255\n" + img.tobytes()
        np.testing.assert_array_equal(decode_pnm(memoryview(data)), img)

    def test_hand_built_p5_16bit(self):
        rng = np.random.default_rng(6)
        img = rng.integers(0, 65536, (3, 4), np.uint16)
        data = b"P5\n4 3\n65535\n" + img.astype(">u2").tobytes()
        np.testing.assert_array_equal(decode_pnm(memoryview(data)), img)

    def test_ascii_p2(self):
        data = b"P2\n3 2\n255\n0 50 100\n150 200 255\n"
        out = decode_pnm(memoryview(data))
        np.testing.assert_array_equal(out, [[0, 50, 100], [150, 200, 255]])

    def test_p4_bitmap(self):
        # 10 wide: two bytes per row, 1=black → 0
        data = b"P4\n10 2\n" + bytes([0b10101010, 0b10000000] * 2)
        out = decode_pnm(memoryview(data))
        assert out.shape == (2, 10)
        assert out[0, 0] == 0 and out[0, 1] == 255

    def test_roundtrip_16bit(self):
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 65536, (33, 47, 3), np.uint16)
        np.testing.assert_array_equal(decode_pnm(memoryview(encode_pnm(arr))), arr)

    def test_bmp_to_pnm_transcode(self, corpus, photo):
        """The BASELINE configs[0] path: BMP → PPM lossless transcode."""
        dec, enc = Decoder(), Encoder()
        img = dec.decode(str(corpus / "bmp" / "photo.bmp"))
        ppm = enc.encode(img, "pnm")
        np.testing.assert_array_equal(np.asarray(dec.decode(ppm)), photo)


class TestBatchAndFallback:
    def test_mixed_format_batch(self, corpus):
        """Heterogeneous batch split per codec
        (reference: ImageGenericDecoder::distributeWork)."""
        paths = [
            str(corpus / "bmp" / "photo.bmp"),
            str(corpus / "pnm" / "photo.ppm"),
            str(corpus / "pnm" / "photo_gray.pgm"),
        ]
        imgs = Decoder().decode(paths)
        assert all(i is not None for i in imgs)
        assert [i.shape[:2] for i in imgs] == [(426, 640)] * 3

    def test_corrupt_sample_fails_cleanly(self, corpus):
        imgs = Decoder().decode(
            [str(corpus / "bmp" / "photo.bmp"), b"garbage-not-an-image"]
        )
        assert imgs[0] is not None
        assert imgs[1] is None

    def test_bmp_encode_roundtrip(self):
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 256, (40, 31, 3), dtype=np.uint8)
        enc, dec = Encoder(), Decoder()
        out = dec.decode(enc.encode(arr, "bmp"))
        np.testing.assert_array_equal(np.asarray(out), arr)

    def test_encoder_write_read(self, tmp_path, photo):
        enc, dec = Encoder(), Decoder()
        p = tmp_path / "photo.ppm"
        enc.write(p, photo)
        np.testing.assert_array_equal(np.asarray(dec.read(str(p))), photo)


def test_plugin_options_string():
    """Free-form options routing: "<plugin_id>:<key>=<value>" reaches the
    plugin (reference mechanism: extensions/nvjpeg/cuda_decoder.cpp:188-209,
    nvjpeg2k num_parallel_tiles)."""
    import oracle
    from util import make_photo
    from nvimagecodec_tpu.core.options import parse_options

    assert parse_options("a:k=1 b:x=yes junk") == {
        "a": {"k": "1"}, "b": {"x": "yes"}
    }
    img = make_photo(40, 56, seed=1)
    data = oracle.jpeg_encode(img, 90, "420")
    dec = Decoder(options="tpu_jpeg_hybrid_decoder:fancy_upsampling=false")
    out = np.asarray(dec.decode(data))
    # plain (non-fancy) upsampling differs from the fancy default but stays
    # within the reference's loose tolerance (test/python/utils.py:61-72)
    ref = oracle.jpeg_decode(data, fancy_upsampling=False)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 4
