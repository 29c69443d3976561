"""On-device (Pallas) restart-parallel JPEG entropy decode — interpret-mode
bit-exactness vs the host entropy decoder (the same anchor the host stage is
held to in test_jpeg_entropy.py; reference analog: the nvjpeg HW engine's
in-silicon entropy decode, extensions/nvjpeg/hw_decoder.cpp:349-404)."""
import numpy as np
import pytest

import oracle
from nvimagecodec_tpu.codecs.jpeg.device_entropy import (
    device_entropy_key,
    reassemble_components,
    split_batch_segments,
)
from nvimagecodec_tpu.codecs.jpeg.entropy_py import decode_coefficients
from nvimagecodec_tpu.codecs.jpeg.headers import parse_jpeg_structure
from nvimagecodec_tpu.codecs.jpeg.tables import ZIGZAG
from nvimagecodec_tpu.ops.pallas_entropy import decode_segments_device
from util import make_photo


def mcus_per_row(frame):
    return -(-frame.width // (8 * frame.hmax))


def run_device_decode(datas):
    """Decode a bucket of identical-geometry JPEGs with the Pallas kernel in
    interpret mode; return per-sample per-component natural-order blocks."""
    frames = [parse_jpeg_structure(d) for d in datas]
    f0 = frames[0]
    assert device_entropy_key(f0) is not None
    max_words = max(
        (fr.scans[0].data_end - fr.scans[0].data_start) for fr in frames
    ) // 4 + 8
    packed = split_batch_segments(frames, datas, max_words)
    assert packed is not None
    words, seg_mcus, nsegs, bad = packed
    assert not bad
    out, err = decode_segments_device(f0, words, seg_mcus, interpret=True)
    assert int(np.sum(np.asarray(err))) == 0, "kernel flagged segments"
    comps = reassemble_components(np, np.asarray(out), f0, len(frames), nsegs)
    # zigzag -> natural order for comparison with the host decoder
    inv = np.zeros(64, np.int64)
    inv[ZIGZAG] = np.arange(64)
    return [np.asarray(c)[..., inv] for c in comps], frames


def check_against_host(datas):
    comps, frames = run_device_decode(datas)
    for i, (data, frame) in enumerate(zip(datas, frames)):
        ref = decode_coefficients(frame, data)
        for c, r in enumerate(ref):
            mine = comps[c][i]
            bh, bw, _ = r.shape
            assert mine.shape[0] >= bh and mine.shape[1] >= bw
            np.testing.assert_array_equal(
                mine[:bh, :bw], r,
                err_msg=f"sample {i} component {c} differs",
            )


@pytest.fixture(scope="module")
def photo():
    return make_photo(96, 144, seed=23)


@pytest.mark.parametrize("ss", ["420", "422", "444", "440", "411", "410"])
def test_chroma_matrix(photo, ss):
    data = oracle.jpeg_encode(photo, 88, ss)
    frame = parse_jpeg_structure(data)
    ri = mcus_per_row(frame)
    check_against_host([oracle.jpeg_encode(photo, 88, ss, restart_interval=ri)])


def test_gray(photo):
    data = oracle.jpeg_encode(photo[:, :, 0], 90, restart_interval=1)
    frame = parse_jpeg_structure(data)
    ri = mcus_per_row(frame)
    check_against_host(
        [oracle.jpeg_encode(photo[:, :, 0], 90, restart_interval=ri)]
    )


def test_multi_row_segments(photo):
    # restart interval spanning two MCU rows
    data = oracle.jpeg_encode(photo, 85, "420")
    frame = parse_jpeg_structure(data)
    ri = 2 * mcus_per_row(frame)
    check_against_host([oracle.jpeg_encode(photo, 85, "420", restart_interval=ri)])


def test_batch_of_different_content(photo):
    imgs = [make_photo(96, 144, seed=s) for s in (1, 2, 3)]
    data = oracle.jpeg_encode(imgs[0], 85, "420")
    frame = parse_jpeg_structure(data)
    ri = mcus_per_row(frame)
    check_against_host(
        [oracle.jpeg_encode(im, 85, "420", restart_interval=ri) for im in imgs]
    )


def test_unsupported_streams_rejected(photo):
    # no restart interval -> host path
    f = parse_jpeg_structure(oracle.jpeg_encode(photo, 85, "420"))
    assert device_entropy_key(f) is None
    # progressive -> host path
    f = parse_jpeg_structure(
        oracle.jpeg_encode(photo, 85, "420", progressive=True, restart_interval=9)
    )
    assert device_entropy_key(f) is None


# --- product-path integration (Decoder routes DRI buckets to the kernel) ---


def test_decoder_route_and_fallback(photo, monkeypatch):
    """The Decoder takes the device route for a restart-interval bucket,
    falls back per-sample for mixed/corrupt streams, and matches the host
    path bit-exactly on the same streams."""
    import nvimagecodec_tpu as nic
    from nvimagecodec_tpu.codecs.jpeg import batch as B

    monkeypatch.setenv("TIC_DEVICE_ENTROPY_MIN_BATCH", "1")
    f = parse_jpeg_structure(oracle.jpeg_encode(photo, 85, "420"))
    ri = mcus_per_row(f)
    imgs = [make_photo(96, 144, seed=s) for s in range(4)]
    datas = [oracle.jpeg_encode(im, 85, "420", restart_interval=ri)
             for im in imgs]
    # one corrupt sample: valid markers, mangled entropy payload
    bad = bytearray(datas[2])
    frame2 = parse_jpeg_structure(datas[2])
    s0 = frame2.scans[0].data_start
    bad[s0 + 40:s0 + 48] = b"\xff\xd1" * 4  # stray RSTs break segment count
    datas[2] = bytes(bad)

    dec = nic.Decoder()
    before = B._device_entropy_fn.cache_info().misses
    out = dec.decode(datas)
    assert B._device_entropy_fn.cache_info().misses > before, (
        "device entropy route was not taken")
    for i, (im, d) in enumerate(zip(out, datas)):
        if i == 2:
            continue  # corrupt: any of None/garbage-free fallback is fine
        ref = oracle.jpeg_decode(d)
        diff = np.abs(np.asarray(im.array).astype(int) - ref.astype(int)).max()
        assert diff <= 4

    # device route disabled -> host path gives identical pixels
    monkeypatch.setenv("TIC_NO_DEVICE_ENTROPY", "1")
    out_host = nic.Decoder().decode([datas[0], datas[1], datas[3]])
    np.testing.assert_array_equal(
        np.asarray(out[0].array), np.asarray(out_host[0].array))
    np.testing.assert_array_equal(
        np.asarray(out[3].array), np.asarray(out_host[2].array))


# ------------------------------------------------- progressive (prototype)
def _check_prog(data):
    from nvimagecodec_tpu.codecs.jpeg import _entropy_decode
    from nvimagecodec_tpu.codecs.jpeg.device_entropy import (
        decode_progressive_device,
    )
    from nvimagecodec_tpu.codecs.jpeg.pixel import ZIGZAG_NAT

    frame = parse_jpeg_structure(data)
    zz = decode_progressive_device(frame, data, interpret=True)
    host = _entropy_decode(frame, data)
    for z, hco in zip(zz, host):
        nat = np.zeros_like(z)
        nat[:, :, ZIGZAG_NAT] = z
        assert np.array_equal(nat, hco)


@pytest.mark.parametrize("ss,split,ri", [
    ("420", 5, 6), ("444", 5, 3), ("420", 20, 12), ("422", 9, 4),
])
def test_progressive_spectral_scans(photo, ss, split, ri):
    """Spectral-selection-only progressive streams decode scan-by-scan on
    the device kernels (DC scan + AC band scans, restart-parallel),
    bit-exact vs the host entropy decoder."""
    data = oracle.jpeg_encode_spectral(photo, 88, ss, split=split,
                                       restart_interval=ri)
    _check_prog(data)


def test_progressive_gray(photo):
    data = oracle.jpeg_encode_spectral(photo[:, :, 0], 90, "gray",
                                       split=8, restart_interval=5)
    _check_prog(data)


@pytest.mark.parametrize("q,ss,ri", [
    (88, "420", 6), (75, "444", 4), (92, "422", 9),
])
def test_progressive_refinement_scans(photo, q, ss, ri):
    """FULL progressive scripts (libjpeg default: successive-approximation
    DC and AC refinement scans, Ah>0) decode scan-by-scan on the device
    kernels, bit-exact vs the host entropy decoder (VERDICT r4 item 4;
    reference decodes full progressive on GPU,
    extensions/nvjpeg/cuda_decoder.cpp:75-76)."""
    data = oracle.jpeg_encode(photo, q, ss, progressive=True,
                              restart_interval=ri)
    frame = parse_jpeg_structure(data)
    assert any(s.ah != 0 for s in frame.scans), "corpus has no Ah>0 scan"
    _check_prog(data)


def test_progressive_refinement_gray(photo):
    data = oracle.jpeg_encode(photo[:, :, 0], 85, "gray", progressive=True,
                              restart_interval=5)
    _check_prog(data)


def test_progressive_refinement_randomized():
    """Randomized geometry/quality battery for the Ah>0 device kernels
    (seeded): every stream must match the host decoder bit-exactly at the
    coefficient level."""
    rng = np.random.default_rng(123)
    for trial in range(6):
        h = int(rng.integers(40, 200))
        w = int(rng.integers(40, 200))
        q = int(rng.integers(50, 96))
        ss = ["420", "422", "444", "gray"][trial % 4]
        ri = int(rng.integers(3, 12))
        img = make_photo(h, w, seed=1000 + trial)
        src = img[:, :, 0] if ss == "gray" else img
        data = oracle.jpeg_encode(src, q, ss, progressive=True,
                                  restart_interval=ri)
        _check_prog(data)
