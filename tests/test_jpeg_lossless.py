"""Lossless JPEG (SOF3) decoder tests against a spec-driven test encoder
(T.81 Annex H written independently in Python) — all seven predictors,
point transform, 8/12/16-bit, gray + RGB, restart intervals.

Reference coverage analog: test/python/test_decode_jpeg_lossless.py."""
import numpy as np
import pytest

from util import make_photo

from nvimagecodec_tpu.codecs.jpeg.encode import BitWriter, derive_encode_table
from nvimagecodec_tpu.codecs.jpeg.headers import HuffTable


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_lossless_jpeg(
    img: np.ndarray, predictor: int = 1, precision: int = 8,
    pt: int = 0, restart_interval: int = 0,
) -> bytes:
    """Minimal SOF3 encoder for test vectors (independent of the decoder)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    samples = (img.astype(np.int64) >> pt).astype(np.int64)

    # Huffman table: categories 0..16 with fixed lengths (canonical)
    cats = list(range(17))
    bits = [0] * 16
    # simple: assign 5-bit codes to all 17 symbols → lengths fit (2^5=32>17)
    bits[4] = 15
    bits[5] = 2
    tbl = HuffTable(bits, cats)
    code, size = derive_encode_table(tbl)

    bw = BitWriter()
    default = 1 << (precision - pt - 1)
    total = h * w
    ri = restart_interval or total
    out_chunks = []
    s = 0
    rst = 0
    while s < total:
        seg_start = s
        seg_end = min(s + ri, total)
        for s in range(seg_start, seg_end):
            y, x = divmod(s, w)
            for j in range(nc):
                a = int(samples[y, x - 1, j]) if x > 0 else 0
                b = int(samples[y - 1, x, j]) if y > 0 else 0
                c = int(samples[y - 1, x - 1, j]) if (x > 0 and y > 0) else 0
                if (x == 0 and y == 0) or (restart_interval and s == seg_start):
                    pred = default
                elif y == 0:
                    pred = a
                elif x == 0:
                    pred = b
                else:
                    pred = {
                        1: a, 2: b, 3: c, 4: a + b - c,
                        5: a + ((b - c) >> 1), 6: b + ((a - c) >> 1),
                        7: (a + b) >> 1,
                    }[predictor]
                diff = (int(samples[y, x, j]) - pred) & 0xFFFF
                if diff >= 0x8000:
                    diff -= 0x10000
                ssss = 16 if diff == 32768 else _csize(diff)
                bw.put(int(code[ssss]), int(size[ssss]))
                if 0 < ssss < 16:
                    bw.put(diff if diff >= 0 else diff + (1 << ssss) - 1, ssss)
        s = seg_end
        if s < total:
            bw.flush()
            out_chunks.append(bytes(bw.out))
            out_chunks.append(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            bw = BitWriter()
    bw.flush()
    out_chunks.append(bytes(bw.out))
    entropy = b"".join(out_chunks)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    dht = bytes([0x00]) + bytes(tbl.bits) + bytes(tbl.values)
    out += seg(0xC4, dht)
    sof = bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for j in range(nc):
        sof += bytes([j + 1, 0x11, 0])
    out += seg(0xC3, sof)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([nc])
    for j in range(nc):
        sos += bytes([j + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_predictors_gray(predictor):
    from nvimagecodec_tpu.codecs.jpeg.lossless import decode_lossless

    g = make_photo(31, 47, seed=predictor)[..., 0]
    data = encode_lossless_jpeg(g, predictor=predictor)
    out = decode_lossless(data, 47, 31, 1)
    assert np.array_equal(out, g)


def test_rgb_interleaved():
    from nvimagecodec_tpu.codecs.jpeg.lossless import decode_lossless

    img = make_photo(25, 33, seed=9)
    data = encode_lossless_jpeg(img, predictor=4)
    assert np.array_equal(decode_lossless(data, 33, 25, 3), img)


def test_16bit():
    from nvimagecodec_tpu.codecs.jpeg.lossless import decode_lossless

    rng = np.random.default_rng(0)
    g = rng.integers(0, 65536, (20, 28)).astype(np.uint16)
    data = encode_lossless_jpeg(g, predictor=1, precision=16)
    out = decode_lossless(data, 28, 20, 1)
    assert out.dtype == np.uint16 and np.array_equal(out, g)


def test_point_transform():
    from nvimagecodec_tpu.codecs.jpeg.lossless import decode_lossless

    g = (make_photo(20, 24, seed=2)[..., 0] & 0xFC)  # divisible by 4
    data = encode_lossless_jpeg(g, predictor=2, pt=2)
    assert np.array_equal(decode_lossless(data, 24, 20, 1), g)


def test_restart_interval():
    from nvimagecodec_tpu.codecs.jpeg.lossless import decode_lossless

    g = make_photo(16, 40, seed=3)[..., 0]
    data = encode_lossless_jpeg(g, predictor=7, restart_interval=100)
    assert np.array_equal(decode_lossless(data, 40, 16, 1), g)


def test_public_api_routing():
    import nvimagecodec_tpu as nic
    from nvimagecodec_tpu.core.types import JpegEncoding

    img = make_photo(22, 30, seed=4)
    data = encode_lossless_jpeg(img, predictor=1)
    cs = nic.CodeStream(data)
    assert cs.codec_name == "jpeg"
    assert cs.get_image_info().jpeg_encoding == JpegEncoding.LOSSLESS_HUFFMAN
    out = nic.Decoder().decode(data)
    assert out is not None and np.array_equal(np.asarray(out), img)
