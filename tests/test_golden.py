"""Golden-MD5 encode regression net — the analog of the reference's
MD5-pinned transcode matrix (test/test_transcode.py:42-100). Every encoder
must be deterministic; a hash change means the emitted bitstream changed
and must be an intentional, reviewed event."""
import hashlib

import numpy as np
import pytest

from util import make_photo

from nvimagecodec_tpu import Encoder
from nvimagecodec_tpu.core.interfaces import (
    EncodeParams,
    Jpeg2kEncodeParams,
    JpegEncodeParams,
)

GOLDEN = {
    "bmp_rgb": ("bmp", "0cd947aa1ac94ce5ac1a8dec11463b77"),
    "pnm_rgb": ("pnm", "e519c0c1bb432ed38f6159085a7df493"),
    "pnm_gray": ("pnm", "0ed4ee89abce1dce17f9f10d2aed567d"),
    "jpeg_q90_420": ("jpeg", "25c94807e84f35930a3fa027504bf56d"),
    "jpeg_q95_444": ("jpeg", "fd32e20d279d57019bfda80c788cc802"),
    "jpeg_gray": ("jpeg", "e84499f538b732eabc7e1b2d1e4e1bb2"),
    "jpeg_optimized": ("jpeg", "13f8b89f3494463b2cf6ca1a427b5675"),
    "jpeg_progressive": ("jpeg", "9282b66745712cd8770f188ebf961709"),
    "jp2_lossless": ("jp2", "3b31672a8d27e2f5f5b8e78c59d89f01"),  # re-pinned: RPCL default now honored
    "j2k_q70": ("jpeg2k", "bc0df3fb2a2b9e9ba40e9369834c55ce"),
    "jp2_gray_lossless": ("jp2", "9f2ca2ec06554b76ea8cfc52aa752162"),
}


def _params(name):
    img = make_photo(60, 80, seed=7)
    gray = img[..., 0]
    table = {
        "bmp_rgb": (img, EncodeParams()),
        "pnm_rgb": (img, EncodeParams()),
        "pnm_gray": (gray, EncodeParams()),
        "jpeg_q90_420": (img, EncodeParams(quality=90, chroma_subsampling="420")),
        "jpeg_q95_444": (img, EncodeParams(quality=95, chroma_subsampling="444")),
        "jpeg_gray": (gray, EncodeParams(quality=92)),
        "jpeg_optimized": (
            img,
            EncodeParams(quality=90, chroma_subsampling="420",
                         jpeg=JpegEncodeParams(optimized_huffman=True)),
        ),
        "jpeg_progressive": (
            img,
            EncodeParams(quality=90, chroma_subsampling="422",
                         jpeg=JpegEncodeParams(progressive=True)),
        ),
        "jp2_lossless": (img, EncodeParams(jpeg2k=Jpeg2kEncodeParams(reversible=True))),
        "j2k_q70": (
            img,
            EncodeParams(quality=70, jpeg2k=Jpeg2kEncodeParams(stream_type="j2k")),
        ),
        "jp2_gray_lossless": (
            gray, EncodeParams(jpeg2k=Jpeg2kEncodeParams(reversible=True)),
        ),
    }
    return table[name]


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_md5(name):
    codec, want = GOLDEN[name]
    pix, params = _params(name)
    data = Encoder().encode(pix, codec=codec, params=params)
    assert data is not None
    assert hashlib.md5(data).hexdigest() == want, name


DECODE_GOLDEN = {
    "jpeg_420": "82ea48efe9ab365b2d99a6e1bde75566",
    "jpeg_prog": "b96333f15f44283da685b569c66d17dd",
    "jpeg_lossless": "2aac65ac3245a05eb17850b60019f9dd",
    "png": "2aac65ac3245a05eb17850b60019f9dd",
    "tiff_lzw_pred": "2aac65ac3245a05eb17850b60019f9dd",
    "webp_vp8l": "2aac65ac3245a05eb17850b60019f9dd",
    "jp2_lossless": "2aac65ac3245a05eb17850b60019f9dd",
}


@pytest.mark.parametrize("name", sorted(DECODE_GOLDEN))
def test_decode_golden_md5(name):
    """Decode-side regression net: pixel hashes pinned per stream class
    (all lossless chains collapse to the source image's hash)."""
    import sys as _sys

    import oracle

    import nvimagecodec_tpu as nic
    from nvimagecodec_tpu.codecs.jpeg2000.core import encode_j2k

    _sys.path.insert(0, "tests")
    from test_jpeg_lossless import encode_lossless_jpeg

    img = make_photo(60, 80, seed=7)
    streams = {
        "jpeg_420": lambda: oracle.jpeg_encode(img, 90, "420"),
        "jpeg_prog": lambda: oracle.jpeg_encode(img, 85, "444", progressive=True),
        "jpeg_lossless": lambda: encode_lossless_jpeg(img, predictor=4),
        "png": lambda: oracle.png_encode(img),
        "tiff_lzw_pred": lambda: oracle.tiff_encode(img, compression=5, predictor=2),
        "webp_vp8l": lambda: oracle.webp_encode_rgb(img, lossless=True),
        "jp2_lossless": lambda: encode_j2k(img, reversible=True, levels=3),
    }
    out = np.ascontiguousarray(np.asarray(nic.Decoder().decode(streams[name]())))
    assert hashlib.md5(out.tobytes()).hexdigest() == DECODE_GOLDEN[name]
