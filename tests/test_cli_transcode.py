"""End-to-end CLI transcode tests — the analog of the reference's golden
transcode net (test/test_transcode.py:34-100 runs nvimtrans via subprocess
and pins MD5s). We assert pixel-exactness of lossless transcode chains and
determinism (same input → byte-identical output across runs)."""
import hashlib
import os
import subprocess
import sys

import numpy as np
import pytest

from util import make_photo

oracle = pytest.importorskip("oracle")


def _run_cli(*argv):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    r = subprocess.run(
        [sys.executable, "-m", "nvimagecodec_tpu.cli", *argv],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr
    return r


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    img = make_photo(60, 80, seed=3)
    (d / "a.jpg").write_bytes(oracle.jpeg_encode(img, 90, "420"))
    (d / "b.png").write_bytes(oracle.png_encode(img))
    return d, img


def test_transcode_to_bmp_pixel_exact_for_png(corpus, tmp_path):
    d, img = corpus
    out = tmp_path / "out"
    _run_cli("imtrans", "-i", str(d / "b.png"), "-c", "bmp", "-o", str(out / "b.bmp"))
    from nvimagecodec_tpu import Decoder

    back = np.asarray(Decoder().read(str(out / "b.bmp")))
    assert np.array_equal(back, img)  # png → bmp is a lossless chain


def test_transcode_deterministic_md5(corpus, tmp_path):
    d, _ = corpus
    sums = []
    for trial in range(2):
        out = tmp_path / f"out{trial}"
        _run_cli("imtrans", "-i", str(d), "-c", "pnm", "-o", str(out))
        batch = {}
        for f in sorted(os.listdir(out)):
            batch[f] = hashlib.md5((out / f).read_bytes()).hexdigest()
        sums.append(batch)
    assert sums[0] == sums[1]
    assert set(sums[0]) == {"a.ppm", "b.ppm"}


def test_improc_resize(corpus, tmp_path):
    d, img = corpus
    out = tmp_path / "r.bmp"
    _run_cli(
        "improc", "-i", str(d / "b.png"), "--resize", "40x30",
        "-c", "bmp", "-o", str(out),
    )
    from nvimagecodec_tpu import Decoder
    from nvimagecodec_tpu.ops.resize import resize_bilinear

    back = np.asarray(Decoder().read(str(out)))
    ref = resize_bilinear(img, 30, 40)
    assert back.shape == (30, 40, 3)
    assert np.array_equal(back, ref)
