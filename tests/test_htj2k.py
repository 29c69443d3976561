"""HTJ2K (ITU-T T.814) conformance: native HT block coder, both directions.

The reference decodes HTJ2K natively via nvjpeg2k
(extensions/nvjpeg2k/cuda_decoder.cpp:178; README.md:38 "High Throughput
JPEG2000"). Here the HT coder is our own (native/j2k_ht.cpp), so the tests
pin it three ways:
  1. committed HT conformance streams (tests/_corpus/htj2k/) decode
     natively bit-exact to their originals;
  2. the system openjpeg 2.5 HT decoder (black-box oracle) agrees
     bit-exactly with ours on the same streams, including streams with
     SigProp + MagRef refinement passes;
  3. generative roundtrips across code-block sizes, tiles, layers,
     progression orders, precincts, bit depths.
"""
import os

import numpy as np
import pytest

from util import make_photo

import nvimagecodec_tpu as nic
from nvimagecodec_tpu.codecs.jpeg2000.core import decode_j2k, encode_j2k

CORPUS = os.path.join(os.path.dirname(__file__), "_corpus", "htj2k")


def _originals():
    z = np.load(os.path.join(CORPUS, "originals.npz"))
    return {k: z[k] for k in z.files}


def _opj():
    try:
        from nvimagecodec_tpu.native import opj_bridge

        opj_bridge.lib()
        return opj_bridge
    except Exception:
        return None


LOSSLESS_CORPUS = [
    ("photo_lossless.jp2", "photo"),
    ("photo_lossless_tiles.j2k", "photo64"),
    ("gray_lossless.j2k", "gray"),
    ("u16_lossless.jp2", "u16"),
    ("photo_layers_rpcl.jp2", "photo"),
    ("photo_precincts.j2k", "photo"),
]


@pytest.mark.parametrize("fname,key", LOSSLESS_CORPUS)
def test_corpus_decodes_natively_bit_exact(fname, key):
    """Committed HT streams decode through OUR T.814 decoder bit-exact —
    no openjpeg involved anywhere in this path."""
    orig = _originals()
    ref = orig["photo"][:64, :128] if key == "photo64" else orig[key]
    data = open(os.path.join(CORPUS, fname), "rb").read()
    img = np.asarray(decode_j2k(data))
    assert img.dtype == ref.dtype
    assert np.array_equal(img, ref)


@pytest.mark.parametrize("fname,key", LOSSLESS_CORPUS)
def test_corpus_matches_openjpeg(fname, key):
    """The independent openjpeg 2.5 HT implementation decodes the same
    corpus streams to the same pixels (true interop, not self-consistency)."""
    opj = _opj()
    if opj is None:
        pytest.skip("system openjpeg unavailable")
    data = open(os.path.join(CORPUS, fname), "rb").read()
    ours = np.asarray(decode_j2k(data)).astype(np.int64)
    theirs, prec, sg = opj.decode(data)
    assert np.array_equal(theirs.astype(np.int64).reshape(ours.shape), ours)


def test_refinement_passes_stream():
    """Z=3 stream (cleanup at p=1 + SigProp + MagRef): our decoder must
    agree bit-exactly with openjpeg on every sample, and be near-lossless
    vs the original (T.814's SigProp reach bounds the loss to |v| <= 1 per
    coefficient; the inverse RCT amplifies that to at most 3 in RGB)."""
    data = open(os.path.join(CORPUS, "photo_z3_passes.jp2"), "rb").read()
    ours = np.asarray(decode_j2k(data)).astype(np.int64)
    orig = _originals()["photo"].astype(np.int64)
    assert np.abs(ours - orig).max() <= 3
    assert (ours == orig).mean() > 0.9
    opj = _opj()
    if opj is not None:
        theirs, _, _ = opj.decode(data)
        assert np.array_equal(theirs.astype(np.int64).reshape(ours.shape),
                              ours)


def test_irreversible_ht_matches_openjpeg():
    data = open(os.path.join(CORPUS, "photo_irrev_q90.jp2"), "rb").read()
    ours = np.asarray(decode_j2k(data)).astype(np.int64)
    orig = _originals()["photo"].astype(np.float64)
    mse = np.mean((ours - orig) ** 2)
    assert 10 * np.log10(255.0**2 / mse) > 45.0
    opj = _opj()
    if opj is not None:
        theirs, _, _ = opj.decode(data)
        # same +-1 float-rounding envelope as the EBCOT irreversible path
        assert np.abs(theirs.astype(np.int64).reshape(ours.shape)
                      - ours).max() <= 1


@pytest.mark.parametrize(
    "kw",
    [
        dict(levels=3),
        dict(levels=2, cblk=(32, 32)),
        dict(levels=2, tile_size=64),
        dict(levels=2, num_layers=4, prog_order="PCRL"),
        dict(levels=1, precincts=(5, 5), prog_order="RPCL"),
        dict(levels=0),
    ],
    ids=["plain", "cblk32", "tiles", "layers-pcrl", "precincts", "no-dwt"],
)
def test_ht_lossless_roundtrip(kw):
    img = make_photo(75, 118, seed=31)
    if kw.get("tile_size"):
        img = make_photo(128, 128, seed=31)
    data = encode_j2k(img, reversible=True, ht=True, **kw)
    assert np.array_equal(np.asarray(decode_j2k(data)), img)


def test_ht_16bit_roundtrip():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 65536, (41, 66)).astype(np.uint16)
    data = encode_j2k(img, reversible=True, ht=True, levels=2)
    out = np.asarray(decode_j2k(data))
    assert out.dtype == np.uint16 and np.array_equal(out, img)


def test_ht_through_public_api():
    """Encoder/Decoder route HT through Jpeg2kEncodeParams(ht=True), and
    the decoder auto-detects HT from the codestream (CAP/SPcod)."""
    from nvimagecodec_tpu.core.interfaces import (EncodeParams,
                                                  Jpeg2kEncodeParams)

    img = make_photo(90, 120, seed=8)
    enc, dec = nic.Encoder(), nic.Decoder()
    data = enc.encode(
        img, codec="jp2",
        params=EncodeParams(jpeg2k=Jpeg2kEncodeParams(reversible=True,
                                                      ht=True)),
    )
    assert data is not None
    # stream really is HTJ2K: CAP marker present + SPcod HT bit set
    from nvimagecodec_tpu.codecs.jpeg2000.codestream import (
        parse_main_header, unwrap_jp2)

    cs = unwrap_jp2(bytes(data))
    assert b"\xff\x50" in cs[:64]  # CAP in the main header
    _siz, cp, _pos = parse_main_header(cs, 0)
    assert cp.cblk_style & 0x40
    out = np.asarray(dec.decode(bytes(data)))
    assert np.array_equal(out, img)


def test_ht_corrupted_stream_fails_cleanly():
    img = make_photo(64, 64, seed=3)
    data = bytearray(encode_j2k(img, reversible=True, ht=True, levels=2,
                                stream_type="j2k"))
    # stomp the cleanup segments' tail region
    data[len(data) // 2: len(data) // 2 + 40] = b"\x00" * 40
    out = nic.Decoder().decode(bytes(data))
    # either a clean per-sample failure (None) or a fallback decode -- but
    # never a crash or a silent wrong-shaped result
    if out is not None:
        assert np.asarray(out).shape == img.shape


def test_ht_parser_reports_info():
    data = open(os.path.join(CORPUS, "photo_lossless.jp2"), "rb").read()
    cs = nic.CodeStream(data)
    info = cs.get_image_info()
    assert (info.height, info.width) == (93, 141)
    assert cs.codec_name == "jpeg2k"


def test_jph_container_roundtrip():
    """.jph (ISO 15444-15 HTJ2K container brand) wraps and decodes through
    the standard path; the JP2-family signature/box walk is brand-agnostic."""
    import nvimagecodec_tpu as nic
    from nvimagecodec_tpu.codecs.jpeg2000.core import decode_j2k, encode_j2k

    img = make_photo(80, 96, seed=9)
    data = encode_j2k(img, reversible=True, levels=3, stream_type="jph",
                      ht=True)
    assert b"jph " in data[:40]
    assert np.array_equal(decode_j2k(data), img)
    out = nic.Decoder().decode(data)
    assert np.array_equal(np.asarray(out), img)
