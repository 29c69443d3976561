"""WebP decoder tests: the native VP8L implementation must be bit-exact vs
libwebp across transform combinations (predictor+cross-color, subtract-
green, palette with sub-byte packing); lossy VP8 is decoded by the native
RFC 6386 keyframe decoder (native/webp_vp8.cpp) bit-exact against libwebp,
with only alpha/animated streams falling to the system-libwebp plugin.

Reference coverage analog: webp parser test (test/parsers/webp_test.cpp)
plus opencv-ext decode tests."""
import numpy as np
import pytest

import nvimagecodec_tpu as nic

from util import make_photo

oracle = pytest.importorskip("oracle")

from nvimagecodec_tpu.codecs.webp import decode_webp_lossless  # noqa: E402


@pytest.mark.parametrize(
    "name,img",
    [
        ("photo", make_photo(40, 56, seed=1)),          # predictor+cross-color
        ("photo_large", make_photo(121, 203, seed=5)),
        ("gray", np.repeat(make_photo(24, 24, seed=2)[..., 0][:, :, None], 3, 2)),
        ("solid", np.full((16, 16, 3), 120, np.uint8)),  # palette path
        ("tiny", make_photo(3, 5, seed=7)),
    ],
)
def test_vp8l_bit_exact(name, img):
    data = oracle.webp_encode_rgb(np.ascontiguousarray(img), lossless=True)
    ref = oracle.webp_decode_rgba(data)[..., :3]
    out = decode_webp_lossless(data)
    out = out[..., :3] if out.shape[-1] == 4 else out
    assert np.array_equal(out, ref)


def test_palette_subbyte_packing():
    rng = np.random.default_rng(3)
    for ncolors in (2, 4, 12, 60):
        vals = rng.integers(0, 256, (ncolors, 3)).astype(np.uint8)
        idx = rng.integers(0, ncolors, (21, 37))
        img = vals[idx]
        data = oracle.webp_encode_rgb(np.ascontiguousarray(img), lossless=True)
        ref = oracle.webp_decode_rgba(data)[..., :3]
        out = decode_webp_lossless(data)
        out = out[..., :3] if out.shape[-1] == 4 else out
        assert np.array_equal(out, ref), ncolors


def test_public_api_lossless_and_lossy():
    import nvimagecodec_tpu as nic

    img = make_photo(48, 64, seed=9)
    dec = nic.Decoder()

    lossless = oracle.webp_encode_rgb(img, lossless=True)
    cs = nic.CodeStream(lossless)
    assert cs.codec_name == "webp"
    out = dec.decode(lossless)
    assert np.array_equal(
        np.asarray(out), oracle.webp_decode_rgba(lossless)[..., :3]
    )

    # lossy VP8 → native RFC 6386 decoder
    lossy = oracle.webp_encode_rgb(img, quality=80.0, lossless=False)
    out = dec.decode(lossy)
    if out is not None:  # fallback only present when libwebp is installed
        ref = oracle.webp_decode_rgba(lossy)[..., :3]
        assert np.asarray(out).shape == ref.shape
        assert np.array_equal(np.asarray(out), ref)


def test_encoder_bit_exact_via_libwebp():
    """Our VP8L encoder's streams must decode bit-exact in libwebp and in
    our own decoder (RGB and RGBA)."""
    from nvimagecodec_tpu.codecs.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    img = make_photo(40, 56, seed=1)
    for pix in (img, np.dstack([img, img[..., 0]])):
        data = encode_webp_lossless(pix)
        ref = oracle.webp_decode_rgba(data)
        want = pix if pix.shape[-1] == 4 else pix
        got = ref if pix.shape[-1] == 4 else ref[..., :3]
        assert np.array_equal(got, want)
        own = decode_webp_lossless(data)
        own = own[..., : pix.shape[-1]] if own.shape[-1] > pix.shape[-1] else own
        assert np.array_equal(own, pix)


def test_encoder_public_api(tmp_path):
    import nvimagecodec_tpu as nic

    img = make_photo(30, 44, seed=3)
    enc, dec = nic.Encoder(), nic.Decoder()
    data = enc.encode(img, codec="webp")
    assert data is not None and data[:4] == b"RIFF"
    assert np.array_equal(np.asarray(dec.decode(data)), img)
    p = tmp_path / "x.webp"
    enc.write(p, img)
    assert np.array_equal(np.asarray(dec.read(str(p))), img)


@pytest.mark.parametrize("q", [20, 55, 75, 92])
def test_vp8_lossy_native_bit_exact(q):
    """Native VP8 decode must be BIT-EXACT against libwebp's own RGB output
    (decoder + fancy upsampler + color convert all reproduced exactly)."""
    from nvimagecodec_tpu.codecs.webp import decode_webp_lossy

    img = make_photo(93, 121, seed=q)
    data = oracle.webp_encode_rgb(img, quality=float(q))
    ours = decode_webp_lossy(data)
    ref = oracle.webp_decode_rgba(data)[..., :3]
    assert np.array_equal(ours, ref)


def test_vp8_lossy_odd_dims_and_segments():
    from nvimagecodec_tpu.codecs.webp import decode_webp_lossy

    for hw in [(17, 31), (16, 16), (33, 47), (129, 65)]:
        img = make_photo(*hw, seed=sum(hw))
        data = oracle.webp_encode_rgb(img, quality=42.0)
        assert np.array_equal(decode_webp_lossy(data),
                              oracle.webp_decode_rgba(data)[..., :3])


def test_vp8_lossy_registers_above_system_fallback():
    """The scheduler must route plain lossy WebP to the native plugin, not
    the system-libwebp rung (reference-ladder semantics)."""
    from nvimagecodec_tpu.codecs import webp as webp_mod
    from nvimagecodec_tpu.core.registry import CodecRegistry

    reg = CodecRegistry()
    webp_mod.register(reg)
    try:
        from nvimagecodec_tpu.codecs import system_codecs

        system_codecs.register(reg)
    except Exception:
        pass
    ids = [d.plugin_id for d in reg.codec("webp").decoders]
    assert "tpu_webp_vp8_decoder" in ids
    if "system_webp_decoder" in ids:
        assert ids.index("tpu_webp_vp8_decoder") < ids.index(
            "system_webp_decoder")


def test_vp8_corrupt_stream_fails_cleanly():
    img = make_photo(48, 48, seed=1)
    data = bytearray(oracle.webp_encode_rgb(img, quality=70.0))
    data[40:60] = b"\xff" * 20
    out = nic.Decoder().decode(bytes(data))
    if out is not None:  # fallback may still manage; never crash
        assert np.asarray(out).ndim == 3


@pytest.mark.parametrize("q", [20, 50, 75, 90])
def test_vp8_encode_bit_exact_across_decoders(q):
    """Our native VP8 ENCODER's streams decode bit-identically in libwebp
    and in our native decoder, across the quality range (reference analog:
    OpenCV imencode .webp + IMWRITE_WEBP_QUALITY,
    extensions/opencv/opencv_encoder.cpp)."""
    from nvimagecodec_tpu.codecs.webp import (
        decode_webp_lossy,
        encode_webp_lossy,
    )

    img = make_photo(90, 140, seed=13)
    data = encode_webp_lossy(img, q)
    ours = decode_webp_lossy(data)
    theirs = oracle.webp_decode_rgba(data)[:, :, :3]
    assert np.array_equal(ours, theirs)


def test_vp8_encode_quality_ladder():
    """Higher quality → larger stream and higher PSNR (through libwebp)."""
    from nvimagecodec_tpu.codecs.webp import encode_webp_lossy

    img = make_photo(120, 180, seed=14)
    prev_size, prev_psnr = 0, 0.0
    for q in (25, 60, 90):
        data = encode_webp_lossy(img, q)
        rec = oracle.webp_decode_rgba(data)[:, :, :3].astype(np.float64)
        p = 10 * np.log10(255.0 ** 2 / np.mean((rec - img) ** 2))
        assert len(data) > prev_size and p > prev_psnr, (q, len(data), p)
        prev_size, prev_psnr = len(data), p
    assert prev_psnr > 33.0  # q90 floor on the photo corpus


def test_vp8_encode_public_api():
    """quality < 95 routes to the native VP8 encoder; default stays
    lossless (bit-exact roundtrip contract)."""
    import nvimagecodec_tpu as nic
    from nvimagecodec_tpu.core.interfaces import EncodeParams

    img = make_photo(64, 100, seed=15)
    enc, dec = nic.Encoder(), nic.Decoder()
    lossy = enc.encode(img, codec="webp", params=EncodeParams(quality=75))
    assert lossy[:4] == b"RIFF" and b"VP8 " in lossy[:20]
    out = np.asarray(dec.decode(lossy))
    assert out.shape == img.shape
    p = 10 * np.log10(255.0 ** 2 / np.mean(
        (out.astype(np.float64) - img) ** 2))
    assert p > 30.0
    # default: lossless VP8L, exact roundtrip
    lossless = enc.encode(img, codec="webp")
    assert b"VP8L" in lossless[:20]
    assert np.array_equal(np.asarray(dec.decode(lossless)), img)


def test_vp8_encode_odd_sizes_and_gray():
    from nvimagecodec_tpu.codecs.webp import (
        decode_webp_lossy,
        encode_webp_lossy,
    )

    for shape, seed in (((17, 31), 1), ((16, 16), 2), ((33, 47), 3)):
        img = make_photo(*shape, seed=seed)
        data = encode_webp_lossy(img, 70)
        assert np.array_equal(decode_webp_lossy(data),
                              oracle.webp_decode_rgba(data)[:, :, :3])
    g = make_photo(40, 52, seed=4)[..., 0]
    data = encode_webp_lossy(g, 70)  # gray → replicated channels
    assert np.array_equal(decode_webp_lossy(data),
                          oracle.webp_decode_rgba(data)[:, :, :3])


def test_vp8_encode_bpred_modes(monkeypatch):
    """B_PRED (4x4 intra) engages on edge-heavy content, improves PSNR at
    smaller size than 16x16-only, and stays bit-exact across decoders."""
    from nvimagecodec_tpu.codecs.webp import (
        decode_webp_lossy,
        encode_webp_lossy,
    )

    rng = np.random.default_rng(1)
    img = np.full((128, 192, 3), 230, np.uint8)
    for _ in range(40):
        y, x = rng.integers(0, 110), rng.integers(0, 170)
        img[y:y + 3, x:x + 20] = 20
        img[y:y + 14, x:x + 2] = 20
    yy, xx = np.mgrid[0:128, 0:192]
    img[(yy + xx) % 24 < 2] = 60

    data = encode_webp_lossy(img, 75)
    ours = decode_webp_lossy(data)
    theirs = oracle.webp_decode_rgba(data)[:, :, :3]
    assert np.array_equal(ours, theirs)
    p = 10 * np.log10(255.0 ** 2 / np.mean(
        (theirs.astype(np.float64) - img) ** 2))
    monkeypatch.setenv("TIC_VP8_NO_BPRED", "1")
    d0 = encode_webp_lossy(img, 75)
    t0 = oracle.webp_decode_rgba(d0)[:, :, :3]
    p0 = 10 * np.log10(255.0 ** 2 / np.mean(
        (t0.astype(np.float64) - img) ** 2))
    assert p > p0 and len(data) <= len(d0), (p, p0, len(data), len(d0))


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (15, 17), (16, 33)])
def test_vp8_encode_tiny_and_odd(shape):
    """Sub-macroblock and odd dimensions pad to the MB grid and stay
    bit-exact across decoders."""
    from nvimagecodec_tpu.codecs.webp import (
        decode_webp_lossy,
        encode_webp_lossy,
    )

    img = np.ascontiguousarray(make_photo(max(shape[0], 16),
                                          max(shape[1], 16),
                                          seed=2)[: shape[0], : shape[1]])
    d = encode_webp_lossy(img, 75)
    assert np.array_equal(decode_webp_lossy(d),
                          oracle.webp_decode_rgba(d)[:, :, :3])


def test_lossy_alpha_native_decode():
    """Lossy+alpha (VP8X + ALPH) decodes natively, bit-exact vs libwebp:
    raw and lossless-coded alpha, all prediction filters libwebp emits."""
    from nvimagecodec_tpu.codecs.webp import decode_webp_lossy

    img = make_photo(60, 90, seed=4)
    grad = np.clip((np.arange(60)[:, None] * 3 + np.arange(90)[None, :])
                   % 256, 0, 255).astype(np.uint8)
    rng = np.random.default_rng(1)
    rnd = rng.integers(0, 256, (60, 90)).astype(np.uint8)
    for a in (grad, rnd, np.full((60, 90), 255, np.uint8)):
        for q in (60, 85):
            d = oracle.webp_encode_rgba(np.dstack([img, a]), float(q))
            ours = decode_webp_lossy(d)
            theirs = oracle.webp_decode_rgba(d)
            assert ours.shape[-1] == 4 or (theirs[:, :, 3] == 255).all()
            if ours.shape[-1] == 4:
                assert np.array_equal(ours, theirs)
            else:
                assert np.array_equal(ours, theirs[:, :, :3])


def test_lossy_alpha_encode_roundtrip():
    """Our RGBA lossy encode (VP8X + raw-alpha ALPH) is libwebp-decodable
    with exact alpha, and roundtrips through the public API."""
    import nvimagecodec_tpu as nic
    from nvimagecodec_tpu.core.interfaces import EncodeParams
    from nvimagecodec_tpu.codecs.webp import (
        decode_webp_lossy,
        encode_webp_lossy,
    )

    img = make_photo(48, 70, seed=6)
    a = ((np.arange(48)[:, None] + np.arange(70)[None, :]) * 2
         % 256).astype(np.uint8)
    rgba = np.dstack([img, a])
    d = encode_webp_lossy(rgba, 75)
    theirs = oracle.webp_decode_rgba(d)
    assert np.array_equal(theirs[:, :, 3], a)
    assert np.array_equal(decode_webp_lossy(d), theirs)
    out = np.asarray(nic.Decoder().decode(nic.Encoder().encode(
        rgba, codec="webp", params=EncodeParams(quality=70))))
    assert out.shape == rgba.shape and np.array_equal(out[:, :, 3], a)


def test_lossless_length_limited_codes_complete():
    """Regression: the length-limited Huffman must emit COMPLETE prefix
    codes (Kraft sum exactly 1) — libwebp rejects incomplete codes that a
    lenient decoder would accept. This image class forced the 7-bit
    code-length-code limiter into its adjustment path."""
    from nvimagecodec_tpu.codecs.webp import encode_webp_lossless

    img = np.ascontiguousarray(make_photo(42, 139, seed=9032)[:16, :131])
    data = encode_webp_lossless(img)
    truth = oracle.webp_decode_rgba(data)  # must not raise
    assert np.array_equal(truth[:, :, :3], img)

    from fractions import Fraction

    from nvimagecodec_tpu.codecs.webp import _limited_huffman_lengths

    rng = np.random.default_rng(3)
    for maxlen in (7, 15):
        for _ in range(200):
            n = int(rng.integers(2, 40))
            freq = rng.integers(0, 1000, n)
            freq[rng.integers(0, n)] += 1  # ensure some mass
            L = _limited_huffman_lengths(freq.astype(np.int64), maxlen)
            nzl = L[L > 0]
            if len(nzl) > 1:
                assert L.max() <= maxlen
                assert sum(Fraction(1, 2 ** int(l)) for l in nzl) == 1
