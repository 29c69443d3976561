"""TIFF decoder tests, bit-exact vs libtiff for the full feature matrix:
strips/tiles × none/LZW/Deflate/PackBits × predictor × chunky/planar ×
u8/u16, plus hand-built palette and white-is-zero streams.

Mirrors the reference's TIFF coverage (test/parsers/tiff_test.cpp +
test/extensions/libtiff_ext_decoder_test.cpp + test_decode_tiff.py).
"""
import struct

import numpy as np
import pytest

from util import make_photo

oracle = pytest.importorskip("oracle")

from nvimagecodec_tpu.codecs.tiff import decode_tiff  # noqa: E402


@pytest.fixture(scope="module")
def img():
    return make_photo(53, 71, seed=8)


@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
def test_compressions(img, comp):
    data = oracle.tiff_encode(img, compression=comp)
    assert np.array_equal(decode_tiff(data), img)


@pytest.mark.parametrize("comp", [5, 8])
def test_predictor(img, comp):
    data = oracle.tiff_encode(img, compression=comp, predictor=2)
    assert np.array_equal(decode_tiff(data), img)


def test_gray_and_alpha(img):
    gray = img[..., 0]
    assert np.array_equal(decode_tiff(oracle.tiff_encode(gray)), gray)
    rgba = np.dstack([img, gray])
    assert np.array_equal(
        decode_tiff(oracle.tiff_encode(rgba, compression=5)), rgba
    )


def test_planar(img):
    data = oracle.tiff_encode(img, planar=2, compression=5, predictor=2)
    assert np.array_equal(decode_tiff(data), img)


@pytest.mark.parametrize("kw", [
    dict(tile_size=16, compression=5),
    dict(tile_size=16, planar=2, compression=8),
    dict(tile_size=32, compression=32773),
])
def test_tiled(img, kw):
    data = oracle.tiff_encode(img, **kw)
    assert np.array_equal(decode_tiff(data), img)


def test_u16(img):
    img16 = (img.astype(np.uint16) << 8) | img
    data = oracle.tiff_encode(img16, compression=8, predictor=2)
    out = decode_tiff(data)
    assert out.dtype == np.uint16 and np.array_equal(out, img16)
    g16 = img16[..., 0]
    data = oracle.tiff_encode(g16, tile_size=32, compression=5)
    assert np.array_equal(decode_tiff(data), g16)


def test_big_endian():
    """MM byte order — hand-built minimal uncompressed gray stream."""
    g = make_photo(9, 13, seed=2)[..., 0]
    h, w = g.shape
    body = g.tobytes()
    # header: MM, magic 42, IFD at 8
    ifd_entries = []

    def ent(tag, typ, n, val):
        ifd_entries.append(struct.pack(">HHI", tag, typ, n) + val)

    data_off = 8 + 2 + 12 * 8 + 4
    ent(256, 3, 1, struct.pack(">HH", w, 0))
    ent(257, 3, 1, struct.pack(">HH", h, 0))
    ent(258, 3, 1, struct.pack(">HH", 8, 0))
    ent(259, 3, 1, struct.pack(">HH", 1, 0))
    ent(262, 3, 1, struct.pack(">HH", 1, 0))
    ent(273, 4, 1, struct.pack(">I", data_off))
    ent(278, 3, 1, struct.pack(">HH", h, 0))
    ent(279, 4, 1, struct.pack(">I", len(body)))
    stream = (
        b"MM\x00*" + struct.pack(">I", 8)
        + struct.pack(">H", len(ifd_entries)) + b"".join(ifd_entries)
        + struct.pack(">I", 0) + body
    )
    assert np.array_equal(decode_tiff(stream), g)


def _little_tiff(entries, body, data_off_base):
    out = b"II*\x00" + struct.pack("<I", 8)
    out += struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)
    return out + body


def test_palette_and_white_is_zero():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 16, (11, 17)).astype(np.uint8)
    cmap = rng.integers(0, 65536, (3, 16)).astype(np.uint16)

    def ent(tag, typ, n, val):
        return struct.pack("<HHI", tag, typ, n) + val

    nent = 10
    cmap_off = 8 + 2 + 12 * nent + 4
    data_off = cmap_off + cmap.size * 2
    entries = [
        ent(256, 3, 1, struct.pack("<HH", 17, 0)),
        ent(257, 3, 1, struct.pack("<HH", 11, 0)),
        ent(258, 3, 1, struct.pack("<HH", 8, 0)),
        ent(259, 3, 1, struct.pack("<HH", 1, 0)),
        ent(262, 3, 1, struct.pack("<HH", 3, 0)),  # palette
        ent(273, 4, 1, struct.pack("<I", data_off)),
        ent(277, 3, 1, struct.pack("<HH", 1, 0)),
        ent(278, 3, 1, struct.pack("<HH", 11, 0)),
        ent(279, 4, 1, struct.pack("<I", idx.size)),
        ent(320, 3, cmap.size, struct.pack("<I", cmap_off)),
    ]
    stream = _little_tiff(entries, cmap.tobytes() + idx.tobytes(), None)
    out = decode_tiff(stream)
    expected = (cmap.T[idx.astype(int)] >> 8).astype(np.uint8)
    assert np.array_equal(out, expected)

    # white-is-zero gray: photometric 0 inverts
    g = idx * 15
    entries[4] = ent(262, 3, 1, struct.pack("<HH", 0, 0))
    entries[9] = ent(320, 3, 0, struct.pack("<I", 0))
    entries = entries[:9]  # drop colormap
    data_off2 = 8 + 2 + 12 * 9 + 4
    entries[5] = ent(273, 4, 1, struct.pack("<I", data_off2))
    stream = _little_tiff(entries, g.tobytes(), None)
    assert np.array_equal(decode_tiff(stream), 255 - g)


def test_lzw_python_fallback_matches_native(img):
    from nvimagecodec_tpu.codecs.tiff import _lzw_decode, _lzw_decode_py
    from nvimagecodec_tpu.codecs.tiff import TiffDirectory

    data = oracle.tiff_encode(img, compression=5, rows_per_strip=53)
    d = TiffDirectory(data)
    off = d.tags[273][0]
    cnt = d.tags[279][0]
    expected = 53 * 71 * 3
    src = data[off : off + cnt]
    assert _lzw_decode(src, expected) == _lzw_decode_py(src, expected)


def test_public_api(img):
    import nvimagecodec_tpu as nic

    data = oracle.tiff_encode(img, compression=5)
    cs = nic.CodeStream(data)
    assert cs.codec_name == "tiff"
    info = cs.get_image_info()
    assert (info.height, info.width) == (53, 71)
    out = nic.Decoder().decode(data)
    assert np.array_equal(np.asarray(out), img)


@pytest.mark.parametrize("comp", [1, 8])
def test_encoder_bit_exact_via_libtiff(img, comp):
    """Our TIFF encoder's streams must decode bit-exact in libtiff AND in
    our own decoder (the reference has no TIFF encoder; completeness)."""
    from nvimagecodec_tpu.codecs.tiff import encode_tiff

    gray = img[..., 0]
    img16 = (img.astype(np.uint16) << 8) | img
    for pix in (img, gray, np.dstack([img, gray]), img16):
        data = encode_tiff(pix, compression=comp)
        assert np.array_equal(oracle.tiff_decode(data).squeeze(), pix.squeeze())
        assert np.array_equal(decode_tiff(data).squeeze(), pix.squeeze())


def test_encoder_public_api(img, tmp_path):
    import nvimagecodec_tpu as nic

    enc, dec = nic.Encoder(), nic.Decoder()
    data = enc.encode(img, codec="tiff")
    assert data is not None and data[:4] == b"II*\x00"
    assert np.array_equal(np.asarray(dec.decode(data)), img)
    p = tmp_path / "x.tif"
    enc.write(p, img)
    assert np.array_equal(np.asarray(dec.read(str(p))), img)


# ---------------------------------------------------------- CCITT fax class
@pytest.fixture(scope="module")
def doc():
    """Bilevel document-like pattern (0 = white, 1 = black)."""
    return (np.indices((90, 130)).sum(0) % 13 < 4).astype(np.uint8)


@pytest.mark.parametrize(
    "comp,t4o,fillorder",
    [
        (2, 0, 1),   # Modified Huffman (CCITTRLE)
        (2, 0, 2),   # ... LSB fill order
        (3, 0, 1),   # G3 1-D
        (3, 1, 1),   # G3 2-D
        (3, 5, 1),   # G3 2-D + fill bits
        (4, 0, 1),   # G4 (T.6 MMR)
        (4, 0, 2),   # G4 LSB fill order
    ],
)
def test_ccitt_fax(doc, comp, t4o, fillorder):
    """CCITT G3/G4 decode vs libtiff-encoded streams (reference decodes
    these through libtiff, extensions/libtiff/libtiff_decoder.cpp)."""
    data = oracle.tiff_encode_fax(doc, comp, t4o, fillorder,
                                  rows_per_strip=32)
    img = decode_tiff(data)
    truth = np.where(doc != 0, 0, 255).astype(np.uint8)  # MINISWHITE
    assert np.array_equal(img, truth)


def test_ccitt_fax_single_strip(doc):
    data = oracle.tiff_encode_fax(doc, 4, 0, 1, rows_per_strip=0)
    assert np.array_equal(
        decode_tiff(data), np.where(doc != 0, 0, 255).astype(np.uint8))


def test_ccitt_fax_roi(doc):
    data = oracle.tiff_encode_fax(doc, 4, 0, 1, rows_per_strip=16)
    full = decode_tiff(data)
    work = {}
    roi = decode_tiff(data, region=(10, 20, 40, 90), work=work)
    assert np.array_equal(roi, full[10:40, 20:90])
    assert work["units"] < work["units_total"]


def test_ccitt_fax_truncated(doc):
    data = oracle.tiff_encode_fax(doc, 4, 0, 1, rows_per_strip=0)
    with pytest.raises(Exception):
        decode_tiff(data[: len(data) // 2])


# ------------------------------------------------------------ JPEG-in-TIFF
@pytest.mark.parametrize(
    "tile_size,rows_per_strip", [(0, 16), (0, 48), (64, 0)]
)
def test_jpeg_in_tiff(tile_size, rows_per_strip):
    """New-style JPEG (compression 7, JPEGTables TechNote2) decode within
    the reference's lossy tolerance vs libtiff+libjpeg ground truth."""
    photo = make_photo(120, 200, seed=3)
    data = oracle.tiff_encode_jpeg(photo, 90, tile_size, rows_per_strip)
    img = decode_tiff(data)
    truth = oracle.tiff_decode(data)
    assert img.shape == truth.shape
    assert np.abs(img.astype(int) - truth.astype(int)).max() <= 4


def test_jpeg_in_tiff_gray():
    g = np.ascontiguousarray(make_photo(120, 200, seed=3)[..., 0])
    data = oracle.tiff_encode_jpeg(g, 90, 0, 16)
    img = decode_tiff(data)
    truth = oracle.tiff_decode(data).squeeze()
    assert np.abs(img.astype(int) - truth.astype(int)).max() <= 4


def test_jpeg_in_tiff_public_api(doc):
    import nvimagecodec_tpu as nic

    photo = make_photo(80, 96, seed=5)
    data = oracle.tiff_encode_jpeg(photo, 92, 0, 16)
    out = np.asarray(nic.Decoder().decode(data))
    truth = oracle.tiff_decode(data)
    assert np.abs(out.astype(int) - truth.astype(int)).max() <= 4
    fax = oracle.tiff_encode_fax(doc, 4, 0, 1, rows_per_strip=0)
    out = np.asarray(nic.Decoder().decode(fax))
    assert np.array_equal(out, np.where(doc != 0, 0, 255).astype(np.uint8))


def test_system_libtiff_rung(img):
    """The last-resort system-libtiff decoder (the reference's libtiff
    extension analog) decodes standard streams; registered below the
    native decoder so it only catches what that one rejects."""
    from nvimagecodec_tpu.codecs.system_codecs import TiffSystemDecoder

    try:
        dec = TiffSystemDecoder()
    except ImportError:
        pytest.skip("libtiff not available")
    data = oracle.tiff_encode(img, compression=5)
    from nvimagecodec_tpu.core.interfaces import DecodeParams

    res = dec.decode_batch([data], [None], DecodeParams())[0]
    assert res.array is not None and np.array_equal(res.array, img)


# --------------------------------------------------------- float samples
@pytest.mark.parametrize(
    "comp,pred",
    [(1, 1), (8, 1), (8, 3), (5, 1), (5, 3), (32773, 1)],
)
def test_float_samples(comp, pred):
    """float32 TIFF (SampleFormat IEEE FP) incl. predictor 3 (floating-
    point horizontal differencing, TIFF TechNote 3) — bit-exact roundtrip
    through libtiff-encoded streams."""
    x = (np.linspace(0, 1, 40 * 30 * 3).reshape(30, 40, 3)
         .astype(np.float32) * np.float32(3.7) - np.float32(1.2))
    for pix in (x, np.ascontiguousarray(x[:, :, 0])):
        data = oracle.tiff_encode_float(pix, comp, pred)
        out = decode_tiff(data)
        assert out.dtype == np.float32
        assert np.array_equal(out.squeeze(), pix.squeeze())


def test_float_public_api():
    import nvimagecodec_tpu as nic
    from nvimagecodec_tpu.core.interfaces import DecodeParams

    x = np.linspace(-2, 2, 24 * 32 * 3).reshape(24, 32, 3).astype(np.float32)
    data = oracle.tiff_encode_float(x, 8, 3)
    out = nic.Decoder().decode(data, DecodeParams(allow_any_depth=True))
    assert np.array_equal(np.asarray(out), x)
