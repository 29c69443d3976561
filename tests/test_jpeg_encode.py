"""JPEG encoder tests: PSNR parity with libjpeg at equal settings, all
subsampling modes, optimized Huffman, roundtrip through our own decoder.

Mirrors the reference's encoder tests (test/extensions/nvjpeg_ext_encoder_
test.cpp + test/python/test_encode.py — quality/psnr assertions vs source).
"""
import numpy as np
import pytest

from nvimagecodec_tpu.core.interfaces import EncodeParams, JpegEncodeParams

from util import make_photo, psnr

oracle = pytest.importorskip("oracle")


def _encode(img, **kw):
    from nvimagecodec_tpu.codecs.jpeg.encode import encode_jpeg

    jp = JpegEncodeParams(optimized_huffman=kw.pop("optimized", False))
    return encode_jpeg(img, EncodeParams(jpeg=jp, **kw))


@pytest.mark.parametrize("css", ["444", "420", "422", "440", "411"])
def test_psnr_parity_with_libjpeg(css):
    img = make_photo(121, 203, seed=7)
    ours = _encode(img, quality=90, chroma_subsampling=css)
    dec = oracle.jpeg_decode(ours)
    our_psnr = psnr(img, dec)
    if css in ("444", "420", "422"):  # modes libjpeg cjpeg supports directly
        ref = oracle.jpeg_encode(img, 90, css)
        ref_psnr = psnr(img, oracle.jpeg_decode(ref))
        assert our_psnr >= ref_psnr - 0.1, (our_psnr, ref_psnr)
        # our streams should not be larger than libjpeg's at equal settings
        assert len(ours) <= len(ref) * 1.05
    else:
        assert our_psnr > 30


@pytest.mark.parametrize("quality", [50, 75, 95])
def test_quality_ladder(quality):
    img = make_photo(96, 128, seed=3)
    data = _encode(img, quality=quality, chroma_subsampling="420")
    p = psnr(img, oracle.jpeg_decode(data))
    ref = psnr(img, oracle.jpeg_decode(oracle.jpeg_encode(img, quality, "420")))
    assert p >= ref - 0.1, (p, ref)


def test_grayscale():
    g = make_photo(80, 112, seed=1)[..., 0]
    data = _encode(g, quality=92)
    dec = oracle.jpeg_decode(data).squeeze()
    assert psnr(g, dec) > 40


def test_optimized_huffman_smaller_same_pixels():
    img = make_photo(121, 203, seed=9)
    d0 = _encode(img, quality=90, chroma_subsampling="420")
    d1 = _encode(img, quality=90, chroma_subsampling="420", optimized=True)
    assert len(d1) < len(d0)
    # identical decoded pixels — only the entropy tables differ
    assert np.array_equal(oracle.jpeg_decode(d0), oracle.jpeg_decode(d1))


def test_roundtrip_own_decoder():
    from nvimagecodec_tpu import Decoder

    img = make_photo(60, 75, seed=5)
    data = _encode(img, quality=95, chroma_subsampling="444")
    out = Decoder().decode(data)
    assert psnr(img, np.asarray(out)) > 40


def test_jax_pixel_stage_matches_numpy():
    from nvimagecodec_tpu.codecs.jpeg.encode import (
        build_encode_frame,
        encode_pixels,
    )
    from nvimagecodec_tpu.core.types import ChromaSubsampling

    img = make_photo(48, 64, seed=2)
    frame = build_encode_frame(48, 64, 3, 85, ChromaSubsampling.CSS_420)
    a = encode_pixels(img, frame, use_jax=False)
    b = encode_pixels(img, frame, use_jax=True)
    for x, y in zip(a, b):
        # float rounding at the quantizer boundary may differ by 1 for a
        # handful of coefficients between backends
        diff = np.abs(np.asarray(x).astype(int) - np.asarray(y).astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 0.01


def test_public_encoder_api(tmp_path):
    from nvimagecodec_tpu import Decoder, Encoder

    img = make_photo(50, 70, seed=11)
    enc, dec = Encoder(), Decoder()
    data = enc.encode(img, codec="jpeg", params=EncodeParams(quality=93))
    assert data[:2] == b"\xff\xd8"
    assert psnr(img, np.asarray(dec.decode(data))) > 38
    # write/read via file path
    p = tmp_path / "x.jpg"
    enc.write(p, img)
    assert psnr(img, np.asarray(dec.read(str(p)))) > 38


def test_native_entropy_encoder_matches_python():
    """Native C++ scan encoder must be bit-identical to the Python reference."""
    from nvimagecodec_tpu.codecs.jpeg import encode as E

    pytest.importorskip("nvimagecodec_tpu.codecs.jpeg.native_encode")
    from nvimagecodec_tpu.codecs.jpeg.native_encode import (
        count_symbols_native,
        entropy_encode_native,
    )
    from nvimagecodec_tpu.core.types import ChromaSubsampling

    img = make_photo(90, 130, seed=13)
    frame = E.build_encode_frame(90, 130, 3, 85, ChromaSubsampling.CSS_420)
    for i, c in enumerate(frame.components):
        c.dc_tbl = c.ac_tbl = 0 if i == 0 else 1
    coefs = [np.asarray(x) for x in E.encode_pixels(img, frame)]
    std = lambda t: E.HuffTable(list(t[0][1:]), list(t[1]))
    dc = {0: std(E.STD_DC_LUMA), 1: std(E.STD_DC_CHROMA)}
    ac = {0: std(E.STD_AC_LUMA), 1: std(E.STD_AC_CHROMA)}
    assert E.entropy_encode_py(frame, coefs, dc, ac) == entropy_encode_native(
        frame, coefs, dc, ac
    )
    # symbol counts agree too
    dcc_n, acc_n = count_symbols_native(frame, coefs)
    dcc_p, acc_p = E.count_symbols(frame, coefs)
    for k in dcc_p:
        assert np.array_equal(dcc_n[k], dcc_p[k])
    for k in acc_p:
        assert np.array_equal(acc_n[k], acc_p[k])


def test_progressive_encode_matches_baseline_pixels():
    """Progressive streams (SOF2 spectral-selection script) must decode —
    in libjpeg AND our own decoder — to pixels identical to the baseline
    encode of the same coefficients."""
    from nvimagecodec_tpu import Decoder

    img = make_photo(121, 203, seed=7)
    base = _encode(img, quality=90, chroma_subsampling="420")
    prog = _encode(
        img, quality=90, chroma_subsampling="420",
        optimized=False,
    )
    from nvimagecodec_tpu.core.interfaces import EncodeParams, JpegEncodeParams
    from nvimagecodec_tpu.codecs.jpeg.encode import encode_jpeg

    prog = encode_jpeg(
        img,
        EncodeParams(
            quality=90, chroma_subsampling="420",
            jpeg=JpegEncodeParams(progressive=True),
        ),
    )
    assert prog[:2] == b"\xff\xd8"
    d_base = oracle.jpeg_decode(base)
    d_prog = oracle.jpeg_decode(prog)
    assert np.array_equal(d_base, d_prog)
    own = np.asarray(Decoder().decode(prog))
    assert np.abs(own.astype(int) - d_prog.astype(int)).max() <= 4
    # progressive with optimized tables is typically smaller than baseline
    assert len(prog) < len(base) * 1.05


def test_progressive_gray():
    from nvimagecodec_tpu.core.interfaces import EncodeParams, JpegEncodeParams
    from nvimagecodec_tpu.codecs.jpeg.encode import encode_jpeg

    g = make_photo(64, 80, seed=3)[..., 0]
    prog = encode_jpeg(
        g, EncodeParams(quality=88, jpeg=JpegEncodeParams(progressive=True))
    )
    base = encode_jpeg(g, EncodeParams(quality=88))
    assert np.array_equal(
        oracle.jpeg_decode(prog).squeeze(), oracle.jpeg_decode(base).squeeze()
    )


def test_device_pixel_stage_option():
    """cpu_jpeg_encoder:device_pixel_stage=true routes the pixel stage
    through jax; output must decode to near-identical pixels."""
    from nvimagecodec_tpu import Decoder, Encoder

    img = make_photo(64, 80, seed=4)
    enc_dev = Encoder(options="cpu_jpeg_encoder:device_pixel_stage=true")
    enc_cpu = Encoder()
    p = EncodeParams(quality=90, chroma_subsampling="420")
    d1 = enc_dev.encode(img, codec="jpeg", params=p)
    d2 = enc_cpu.encode(img, codec="jpeg", params=p)
    a = np.asarray(Decoder().decode(d1)).astype(int)
    b = np.asarray(Decoder().decode(d2)).astype(int)
    assert np.abs(a - b).max() <= 2  # one-ulp quantizer boundary effects


# --------------------------------------------------------------------------
# Fused single-pass native encoder (native/jpeg_encode_fast.cpp) — the host
# hot path the batched Encoder uses when the device stage is off
# --------------------------------------------------------------------------

def _fused_encode(img, quality=85, css=None):
    from nvimagecodec_tpu.codecs.jpeg import encode as E
    from nvimagecodec_tpu.codecs.jpeg.native_encode import (
        encode_scan_fused, fused_setup,
    )
    from nvimagecodec_tpu.core.types import ChromaSubsampling

    nchan = 1 if img.ndim == 2 else img.shape[-1]
    if css is None:
        css = ChromaSubsampling.GRAY if nchan == 1 else ChromaSubsampling.CSS_420
    frame = E.build_encode_frame(img.shape[0], img.shape[1], nchan, quality,
                                 css, 8)
    for i, c in enumerate(frame.components):
        c.dc_tbl = c.ac_tbl = 0 if i == 0 else 1
    std = lambda t: E.HuffTable(list(t[0][1:]), list(t[1]))
    dc = {0: std(E.STD_DC_LUMA)}
    ac = {0: std(E.STD_AC_LUMA)}
    if len(frame.components) > 1:
        dc[1] = std(E.STD_DC_CHROMA)
        ac[1] = std(E.STD_AC_CHROMA)
    scan = encode_scan_fused(img, frame, None, None,
                             setup=fused_setup(frame, dc, ac))
    return E.jpeg_header_bytes(frame, dc, ac) + scan + b"\xff\xd9"


@pytest.mark.parametrize("css_name,shape", [
    ("420", (375, 500)), ("420", (90, 131)), ("420", (33, 17)),
    ("444", (64, 80)), ("422", (61, 77)), ("440", (61, 77)),
])
def test_fused_encoder_psnr(css_name, shape):
    """Fused native encode decodes (libjpeg) to within 0.3 dB of the oracle
    encoder at the same settings — odd sizes exercise the edge-replicate
    and scalar-tail paths."""
    from nvimagecodec_tpu.core.types import ChromaSubsampling

    css = {"420": ChromaSubsampling.CSS_420, "444": ChromaSubsampling.CSS_444,
           "422": ChromaSubsampling.CSS_422, "440": ChromaSubsampling.CSS_440}[css_name]
    img = make_photo(*shape, seed=11)
    data = _fused_encode(img, 85, css)
    dec = oracle.jpeg_decode(data)
    ours = psnr(img, dec)
    ref = psnr(img, oracle.jpeg_decode(
        oracle.jpeg_encode(img, 85, css_name)))
    assert ours >= ref - 0.3, (ours, ref)


def test_fused_encoder_gray():
    g = make_photo(100, 99, seed=5)[..., 0].copy()
    data = _fused_encode(g, 90)
    assert psnr(g, oracle.jpeg_decode(data).squeeze()) > 40


def test_fused_encoder_matches_staged_coefficients():
    """Same coefficients (AAN vs orthonormal fDCT differ by at most ±1 on
    quantizer boundaries) — decoded pixels within 2."""
    from nvimagecodec_tpu import Decoder

    img = make_photo(120, 160, seed=9)
    fused = _fused_encode(img, 85)
    from nvimagecodec_tpu.codecs.jpeg.encode import encode_jpeg

    staged = encode_jpeg(img, EncodeParams(quality=85,
                                           chroma_subsampling="420"))
    a = oracle.jpeg_decode(fused).astype(int)
    b = oracle.jpeg_decode(staged).astype(int)
    assert np.abs(a - b).max() <= 2


def test_fused_encoder_via_encoder_api_host_route(monkeypatch):
    """Encoder() with the device stage disabled routes through the fused
    native path; stream must decode everywhere."""
    from nvimagecodec_tpu import Decoder, Encoder

    monkeypatch.setenv("TIC_ENCODE_DEVICE", "0")
    img = make_photo(81, 123, seed=6)
    data = Encoder().encode(img, codec="jpeg",
                            params=EncodeParams(quality=88,
                                                chroma_subsampling="420"))
    assert psnr(img, oracle.jpeg_decode(data)) > 33
    assert psnr(img, np.asarray(Decoder().decode(data))) > 33
