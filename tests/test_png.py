"""PNG decoder tests: bit-exact vs libpng for every color-type/bit-depth,
plus hand-built streams for palette, tRNS, sub-byte depths and Adam7
interlace (the oracle writer doesn't produce those).

Mirrors the reference's PNG coverage (parser: test/parsers/png_test.cpp;
decode via opencv ext: test/extensions/opencv_ext_decoder_test.cpp).
"""
import struct
import zlib

import numpy as np
import pytest

from util import make_photo

oracle = pytest.importorskip("oracle")

from nvimagecodec_tpu.codecs.png import decode_png  # noqa: E402


# ---------------------------------------------------------------- helpers
def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def write_png(
    samples: np.ndarray,
    color_type: int,
    bit_depth: int,
    palette=None,
    trns=None,
    interlace: int = 0,
) -> bytes:
    """Minimal spec-following PNG writer (filter 0 rows; spec Adam7 pass
    extraction written independently of the decoder)."""
    h, w = samples.shape[:2]
    ch = samples.shape[2] if samples.ndim == 3 else 1
    samples = samples.reshape(h, w, ch)

    def pack_rows(sub: np.ndarray) -> bytes:
        sh, sw = sub.shape[:2]
        out = bytearray()
        for y in range(sh):
            row = sub[y]
            if bit_depth == 16:
                rb = row.astype(">u2").tobytes()
            elif bit_depth == 8:
                rb = row.astype(np.uint8).tobytes()
            else:
                per = 8 // bit_depth
                vals = row.reshape(-1)
                pad = (-len(vals)) % per
                vals = np.concatenate([vals, np.zeros(pad, vals.dtype)])
                packed = np.zeros(len(vals) // per, np.uint8)
                for i in range(per):
                    packed |= (
                        vals[i::per].astype(np.uint8)
                        << ((per - 1 - i) * bit_depth)
                    )
                rb = packed.tobytes()
            out += b"\x00" + rb
        return bytes(out)

    if interlace == 0:
        raw = pack_rows(samples)
    else:
        passes = [
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ]
        raw = b""
        for (x0, y0, dx, dy) in passes:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += pack_rows(sub)

    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace),
    )
    if palette is not None:
        out += _chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(raw))
    out += _chunk(b"IEND", b"")
    return bytes(out)


# ------------------------------------------------------------------ tests
@pytest.mark.parametrize(
    "ch,bd", [(1, 8), (2, 8), (3, 8), (4, 8), (1, 16), (3, 16), (4, 16)]
)
def test_bit_exact_vs_libpng(ch, bd):
    img = make_photo(75, 103, seed=4)
    pix = {
        1: img[..., 0],
        2: np.dstack([img[..., 0], img[..., 1]]),
        3: img,
        4: np.dstack([img, img[..., 0]]),
    }[ch]
    if bd == 16:
        pix = (pix.astype(np.uint16) << 8) | pix
    data = oracle.png_encode(pix)
    out, _ = decode_png(data)
    assert np.array_equal(out.squeeze(), pix.squeeze())
    assert out.dtype == (np.uint16 if bd == 16 else np.uint8)


def test_palette():
    rng = np.random.default_rng(0)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (40, 56)).astype(np.uint8)
    data = write_png(idx, color_type=3, bit_depth=8, palette=pal)
    out, _ = decode_png(data)
    assert np.array_equal(out, pal[idx])


def test_palette_with_alpha():
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    alpha = rng.integers(0, 256, 8).astype(np.uint8)
    idx = rng.integers(0, 8, (33, 47)).astype(np.uint8)
    data = write_png(idx, 3, 8, palette=pal, trns=alpha.tobytes())
    out, _ = decode_png(data)
    assert out.shape == (33, 47, 4)
    assert np.array_equal(out[..., :3], pal[idx])
    assert np.array_equal(out[..., 3], alpha[idx])


@pytest.mark.parametrize("bd", [1, 2, 4])
def test_sub_byte_gray(bd):
    rng = np.random.default_rng(bd)
    maxv = (1 << bd) - 1
    g = rng.integers(0, maxv + 1, (21, 37)).astype(np.uint8)
    data = write_png(g, 0, bd)
    out, _ = decode_png(data)
    # decoder scales sub-byte gray to full 8-bit range
    assert np.array_equal(out, (g * (255 // maxv)).astype(np.uint8))


def test_color_key_transparency():
    img = make_photo(30, 40, seed=2)
    key = img[0, 0].copy()
    data = write_png(img, 2, 8, trns=struct.pack(">HHH", *key))
    out, _ = decode_png(data)
    assert out.shape == (30, 40, 4)
    mask = (img == key).all(axis=-1)
    assert (out[..., 3][mask] == 0).all()
    assert (out[..., 3][~mask] == 255).all()


@pytest.mark.parametrize("ch,ct", [(1, 0), (3, 2), (4, 6)])
def test_adam7_interlace(ch, ct):
    img = make_photo(51, 67, seed=5)
    pix = {1: img[..., 0], 3: img, 4: np.dstack([img, img[..., 1]])}[ch]
    data = write_png(pix, ct, 8, interlace=1)
    out, _ = decode_png(data)
    assert np.array_equal(out.squeeze(), pix.squeeze())


def test_all_filters_roundtrip():
    """libpng picks filters adaptively on noisy data — exercise Sub/Up/Avg/
    Paeth paths through the native defilter."""
    rng = np.random.default_rng(9)
    smooth = np.cumsum(rng.integers(-3, 4, (64, 80, 3)), axis=1).astype(np.uint8)
    data = oracle.png_encode(smooth)
    out, _ = decode_png(data)
    assert np.array_equal(out, smooth)


def test_python_defilter_matches_native():
    from nvimagecodec_tpu.codecs.png import PngStream, _defilter, _defilter_py

    img = make_photo(40, 50, seed=3)
    ps = PngStream(oracle.png_encode(img))
    rowbytes = 50 * 3
    native = _defilter(ps.raw, 0, 40, rowbytes, 3)
    pyref = _defilter_py(memoryview(ps.raw)[: 40 * (rowbytes + 1)], 40, rowbytes, 3)
    assert np.array_equal(native, pyref)


def test_public_api_and_info():
    import nvimagecodec_tpu as nic

    img = make_photo(44, 62, seed=6)
    data = oracle.png_encode(img)
    cs = nic.CodeStream(data)
    assert cs.codec_name == "png"
    info = cs.get_image_info()
    assert (info.height, info.width) == (44, 62)
    out = nic.Decoder().decode(data)
    assert np.array_equal(np.asarray(out), img)


def test_u16_default_depth_reduction():
    import nvimagecodec_tpu as nic
    from nvimagecodec_tpu.core.interfaces import DecodeParams

    img = make_photo(20, 25, seed=7)
    pix16 = (img.astype(np.uint16) << 8) | img
    data = oracle.png_encode(pix16)
    # default: u8 output (reference python default, python/decoder.cpp:156-225)
    out = nic.Decoder().decode(data)
    assert np.asarray(out).dtype == np.uint8
    # allow_any_depth keeps u16
    out16 = nic.Decoder().decode(data, DecodeParams(allow_any_depth=True))
    assert np.asarray(out16).dtype == np.uint16


@pytest.mark.parametrize(
    "shape_dtype",
    [("rgb8", None), ("gray8", None), ("rgba8", None), ("rgb16", None), ("ga8", None)],
)
def test_encoder_bit_exact_via_libpng(shape_dtype):
    """Our PNG encoder's streams must decode bit-exact in libpng."""
    from nvimagecodec_tpu.codecs.png import encode_png

    kind, _ = shape_dtype
    img = make_photo(75, 103, seed=4)
    pix = {
        "rgb8": img,
        "gray8": img[..., 0],
        "rgba8": np.dstack([img, img[..., 0]]),
        "rgb16": (img.astype(np.uint16) << 8) | img,
        "ga8": np.dstack([img[..., 0], img[..., 1]]),
    }[kind]
    data = encode_png(pix)
    assert np.array_equal(oracle.png_decode(data).squeeze(), pix.squeeze())


def test_encoder_public_api_roundtrip(tmp_path):
    import nvimagecodec_tpu as nic

    img = make_photo(40, 52, seed=8)
    enc, dec = nic.Encoder(), nic.Decoder()
    data = enc.encode(img, codec="png")
    assert data is not None and data[:8] == b"\x89PNG\r\n\x1a\n"
    assert np.array_equal(np.asarray(dec.decode(data)), img)
    p = tmp_path / "x.png"
    enc.write(p, img)
    assert np.array_equal(np.asarray(dec.read(str(p))), img)
