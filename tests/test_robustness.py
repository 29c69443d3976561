"""Robustness: corrupted/truncated streams across every codec must yield a
clean per-sample failure (None from the API), never a crash, hang, or junk
success — the contract behind the reference's per-sample ProcessingStatus
bitmask + runtime fallback (include/nvimgcodec.h:583-612)."""
import numpy as np
import pytest

from util import make_photo

import nvimagecodec_tpu as nic

oracle = pytest.importorskip("oracle")


def _corpus():
    img = make_photo(40, 56, seed=1)
    from nvimagecodec_tpu.codecs.jpeg2000.core import encode_j2k

    out = {
        "jpeg": oracle.jpeg_encode(img, 90, "420"),
        "png": oracle.png_encode(img),
        "tiff": oracle.tiff_encode(img, compression=5),
        "webp": oracle.webp_encode_rgb(img, lossless=True),
        "jp2": encode_j2k(img, reversible=True, levels=2),
    }
    from nvimagecodec_tpu.codecs.bmp import encode_bmp

    out["bmp"] = encode_bmp(img)
    return out


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


@pytest.mark.parametrize("frac", [0.1, 0.5, 0.9])
def test_truncated_streams(corpus, frac):
    dec = nic.Decoder()
    for name, data in corpus.items():
        cut = data[: int(len(data) * frac)]
        out = dec.decode(cut)  # must not raise or hang
        if out is not None:
            # A decoder may tolerate tail truncation, but then its output must
            # be the real partial decode, not shaped garbage: full-frame
            # geometry/dtype, and the portion that was decoded from intact
            # bytes must match the full decode bit-for-bit.
            a = np.asarray(out)
            full = np.asarray(dec.decode(data))
            assert a.shape == full.shape and a.dtype == full.dtype, name
            if frac == 0.9 and name != "jp2":
                # Raster codecs decode sequentially: with 90% of the stream
                # present, at least a quarter of the rows must be identical to
                # the full decode (J2K is excluded: the DWT spreads truncation
                # loss over the whole tile).
                row_ok = (a.reshape(a.shape[0], -1) == full.reshape(full.shape[0], -1)).all(axis=1)
                assert row_ok.mean() >= 0.25, (name, row_ok.mean())


def test_bit_flips(corpus):
    rng = np.random.default_rng(0)
    dec = nic.Decoder()
    for name, data in corpus.items():
        for trial in range(4):
            buf = bytearray(data)
            for _ in range(3):
                i = int(rng.integers(0, len(buf)))
                buf[i] ^= 1 << int(rng.integers(0, 8))
            out = dec.decode(bytes(buf))
            if out is not None:
                a = np.asarray(out)
                assert a.ndim in (2, 3)


def test_garbage_and_empty():
    dec = nic.Decoder()
    outs = dec.decode([b"", b"\x00" * 64, b"RIFFxxxxWEBP", b"\xff\xd8\xff"])
    assert all(o is None for o in outs)


def _jpeg_with_dht(bits):
    """Minimal JPEG stream carrying a crafted DHT (bits = 16 counts)."""
    vals = bytes(range(min(sum(bits), 256)))
    dht = bytes([0x00]) + bytes(bits) + vals
    seg = b"\xff\xc4" + (len(dht) + 2).to_bytes(2, "big") + dht
    dqt = b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes([16] * 64)
    sof = b"\xff\xc0" + (11).to_bytes(2, "big") + bytes(
        [8, 0, 8, 0, 8, 1, 1, 0x11, 0]
    )
    sos = b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, 1, 0x00, 0, 63, 0])
    return b"\xff\xd8" + dqt + seg + sof + sos + b"\xa5" * 32 + b"\xff\xd9"


def test_malformed_dht_overflow():
    """DHT whose canonical codes overflow their bit length (e.g. 255 codes of
    length 1) must fail cleanly — previously smashed the native decoder's
    stack via an out-of-bounds lookahead-LUT write (ADVICE r1, high)."""
    dec = nic.Decoder()
    crafted = [
        [255] + [0] * 15,            # 255 codes of length 1
        [2, 255] + [0] * 14,         # overflow at length 2
        [1] * 16,                    # fills exactly; last length overflows? no
        [0] * 14 + [255, 255],       # huge long-code counts
    ]
    for bits in crafted:
        out = dec.decode(_jpeg_with_dht(bits))
        # clean failure or a sane decode — never a crash
        if out is not None:
            a = np.asarray(out)
            assert a.ndim in (2, 3)


def test_batch_isolation(corpus):
    """One corrupted sample must not poison its batch."""
    dec = nic.Decoder()
    good = list(corpus.values())
    batch = good[:2] + [good[0][:30]] + good[2:]
    outs = dec.decode(batch)
    assert outs[2] is None
    assert all(o is not None for i, o in enumerate(outs) if i != 2)


def test_parser_fuzz_random_blobs():
    """Random byte blobs through format detection and decode: never crash,
    never hang (reference: parser canParse robustness)."""
    rng = np.random.default_rng(42)
    dec = nic.Decoder()
    magics = [
        b"\xff\xd8\xff", b"\x89PNG\r\n\x1a\n", b"II*\x00", b"MM\x00*",
        b"BM", b"P6", b"RIFF", b"\xff\x4f\xff\x51",
        b"\x00\x00\x00\x0cjP  ",
    ]
    for trial in range(200):
        n = int(rng.integers(0, 400))
        blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        if trial % 2:
            blob = bytes(magics[trial % len(magics)]) + blob
        try:
            cs = nic.CodeStream(blob)
            cs.get_image_info()
        except Exception:
            pass
        out = dec.decode(blob)
        if out is not None:
            assert np.asarray(out).ndim in (2, 3)


@pytest.mark.parametrize("shape", [(1, 1), (1, 7), (8, 1), (3, 3), (2, 2)])
def test_edge_sizes_all_codecs(shape):
    """Tiny/degenerate dimensions through every codec's encode+decode
    (lossless paths bit-exact; JPEG shape-correct)."""
    from util import make_photo

    from nvimagecodec_tpu.core.interfaces import (
        EncodeParams,
        Jpeg2kEncodeParams,
    )

    h, w = shape
    enc, dec = nic.Encoder(), nic.Decoder()
    img = make_photo(max(h, 8), max(w, 8), seed=1)[:h, :w]
    for codec in ("bmp", "pnm", "png", "tiff", "webp", "jpeg", "jp2"):
        params = EncodeParams(quality=95)
        if codec == "jp2":
            params = EncodeParams(jpeg2k=Jpeg2kEncodeParams(reversible=True))
        data = enc.encode(img, codec=codec, params=params)
        assert data is not None, codec
        out = dec.decode(data)
        assert out is not None, codec
        a = np.asarray(out)
        assert a.shape[:2] == (h, w), (codec, a.shape)
        if codec != "jpeg":
            assert np.array_equal(a, img), codec


def test_large_mixed_batch_under_load(corpus):
    """300-sample mixed-format batch with interleaved corrupt samples:
    ordering, per-sample isolation and correctness at scale."""
    from util import make_photo

    rng = np.random.default_rng(5)
    keys = list(corpus)
    batch = []
    expect_ok = []
    for i in range(300):
        if i % 17 == 3:
            batch.append(bytes(rng.integers(0, 256, 80, dtype=np.uint8)))
            expect_ok.append(False)
        else:
            batch.append(corpus[keys[i % len(keys)]])
            expect_ok.append(True)
    outs = nic.Decoder().decode(batch)
    assert len(outs) == 300
    img = make_photo(40, 56, seed=1)
    for i, (o, ok) in enumerate(zip(outs, expect_ok)):
        if not ok:
            assert o is None, i
        else:
            a = np.asarray(o)
            assert a.shape[:2] == (40, 56), (i, a.shape)
            if keys[i % len(keys)] in ("png", "tiff", "webp", "jp2", "bmp"):
                assert np.array_equal(a, img), i


def test_j2k_native_t2_fuzz():
    """Adversarial coverage for the NATIVE T2 packet parser + block-batch
    path (native/j2k_t2.cpp, j2k_block_batch.cpp): hundreds of corrupted
    variants (truncations, byte stomps, random splices) of EBCOT, HT,
    multi-layer, precinct, and animated-tile streams must decode to a
    clean result or a clean per-sample None — never crash, hang, or
    return a wrong-shaped array."""
    from nvimagecodec_tpu.codecs.jpeg2000.core import encode_j2k

    img = make_photo(72, 96, seed=9)
    bases = [
        encode_j2k(img, reversible=True, levels=3, stream_type="j2k"),
        encode_j2k(img, reversible=True, levels=2, ht=True,
                   stream_type="j2k"),
        encode_j2k(img, reversible=True, levels=2, num_layers=3,
                   prog_order="RPCL", precincts=(4, 4), stream_type="j2k"),
        encode_j2k(img, reversible=True, levels=2, tile_size=33,
                   stream_type="j2k", grid_offset=(3, 5)),
    ]
    rng = np.random.default_rng(7)
    dec = nic.Decoder()
    for data in bases:
        n = len(data)
        variants = []
        for frac in (0.3, 0.6, 0.85, 0.97):
            variants.append(data[: int(n * frac)])
        for _ in range(24):
            buf = bytearray(data)
            kind = int(rng.integers(0, 3))
            if kind == 0:  # stomp a run
                i = int(rng.integers(2, n - 40))
                ln = int(rng.integers(1, 40))
                buf[i : i + ln] = bytes(rng.integers(0, 256, ln,
                                                     dtype=np.uint8))
            elif kind == 1:  # bit flips
                for _ in range(6):
                    i = int(rng.integers(0, n))
                    buf[i] ^= 1 << int(rng.integers(0, 8))
            else:  # splice two halves at mismatched offsets
                i = int(rng.integers(2, n - 2))
                j = int(rng.integers(2, n - 2))
                buf = bytearray(data[:i] + data[j:])
            variants.append(bytes(buf))
        for v in variants:
            out = dec.decode(v)
            if out is not None:
                a = np.asarray(out)
                assert a.ndim in (2, 3) and a.shape[0] > 0


class TestRound4PathRobustness:
    """Fuzz the r04 decode paths (CCITT fax, arithmetic JPEG, JPEG-in-TIFF)
    through the public API: truncations and bit flips must give per-sample
    failure or a well-formed image — never a crash or hang."""

    def _hammer(self, data: bytes, rng):
        import nvimagecodec_tpu as nic

        dec = nic.Decoder()
        cases = [data[: len(data) // 4], data[: len(data) // 2],
                 data[:-7], data[:16]]
        for _ in range(8):
            b = bytearray(data)
            for _ in range(4):
                b[rng.integers(0, len(b))] ^= 1 << rng.integers(0, 8)
            cases.append(bytes(b))
        outs = dec.decode(cases)
        assert len(outs) == len(cases)  # every slot resolved, no hang

    def test_fax_fuzz(self):
        oracle = pytest.importorskip("oracle")
        rng = np.random.default_rng(41)
        doc = (np.indices((64, 96)).sum(0) % 11 < 3).astype(np.uint8)
        for comp in (2, 3, 4):
            self._hammer(oracle.tiff_encode_fax(doc, comp, 1 if comp == 3
                                                else 0, 1, 32), rng)

    def test_arith_jpeg_fuzz(self):
        oracle = pytest.importorskip("oracle")
        rng = np.random.default_rng(42)
        img = make_photo(72, 96, seed=1)
        try:
            seq = oracle.jpeg_encode_arith(img, 90, "420")
            prog = oracle.jpeg_encode_arith(img, 90, "444", progressive=True)
        except RuntimeError:
            pytest.skip("no arithmetic support in libjpeg")
        self._hammer(seq, rng)
        self._hammer(prog, rng)

    def test_jpeg_in_tiff_fuzz(self):
        oracle = pytest.importorskip("oracle")
        rng = np.random.default_rng(43)
        img = make_photo(72, 96, seed=2)
        self._hammer(oracle.tiff_encode_jpeg(img, 90, 0, 16), rng)
        self._hammer(oracle.tiff_encode_jpeg(img, 90, 64, 0), rng)

    def test_float_tiff_fuzz(self):
        oracle = pytest.importorskip("oracle")
        rng = np.random.default_rng(44)
        x = np.linspace(0, 1, 48 * 64 * 3).reshape(48, 64, 3).astype(
            np.float32)
        self._hammer(oracle.tiff_encode_float(x, 8, 3), rng)


class TestSystemFallbackRungs:
    """The JPEG/PNG ladders now have a system-library bottom rung (the
    reference's opencv-backstop shape, extensions/opencv/opencv_ext.cpp:
    38-44): a corrupted-but-libjpeg-decodable stream falls through the
    native decoders and still decodes through the public Decoder."""

    def test_corrupt_jpeg_falls_through_to_system_rung(self):
        oracle = pytest.importorskip("oracle")
        from nvimagecodec_tpu.codecs.jpeg import JpegHybridTpuDecoder
        from nvimagecodec_tpu.codecs.system_codecs import JpegSystemDecoder
        from nvimagecodec_tpu.core.interfaces import DecodeParams

        img = make_photo(64, 80, seed=1)
        good = bytearray(oracle.jpeg_encode(img, 85, "420"))
        sos = bytes(good).find(b"\xff\xda")
        nat = JpegHybridTpuDecoder()
        try:
            shim = JpegSystemDecoder()
        except ImportError:
            pytest.skip("no system libjpeg")
        P = DecodeParams()
        # find a scan-byte mutation our native entropy decoder rejects but
        # libjpeg tolerates (warning + resync)
        mutant = None
        for pos in range(sos + 14, min(len(good) - 2, sos + 360)):
            for val in (0x7F, 0xC0):
                if good[pos] in (val, 0xFF):
                    continue
                m = bytes(good[:pos]) + bytes([val]) + bytes(good[pos + 1:])
                if nat.decode_batch([m], [None], P)[0].array is not None:
                    continue
                if shim.decode_batch([m], [None], P)[0].array is not None:
                    mutant = m
                    break
            if mutant:
                break
        assert mutant is not None, "no native-reject/libjpeg-accept mutation"
        out = nic.Decoder().decode(mutant)  # ladder fall-through
        assert out is not None
        assert np.asarray(out).shape == (64, 80, 3)

    def test_png_system_rung_registered(self):
        from nvimagecodec_tpu.codecs.system_codecs import PngSystemDecoder
        from nvimagecodec_tpu.core.interfaces import DecodeParams

        oracle = pytest.importorskip("oracle")
        try:
            p = PngSystemDecoder()
        except ImportError:
            pytest.skip("no system libpng")
        img = make_photo(40, 56, seed=3)
        png = oracle.png_encode(img)
        info = nic.CodeStream(png).get_image_info()
        r = p.decode_batch([png], [info], DecodeParams())[0]
        assert np.array_equal(r.array, oracle.png_decode(png))
