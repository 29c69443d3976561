"""Parser tests over the synthesized corpus
(model: reference test/parsers/*_test.cpp — assert extracted ImageInfo)."""
import numpy as np
import pytest

from nvimagecodec_tpu import (
    ChromaSubsampling,
    CodeStream,
    ColorSpec,
    JpegEncoding,
    Orientation,
    SampleDataType,
)
from util import add_exif_orientation, make_photo


def info_of(src):
    return CodeStream(src).get_image_info()


class TestJpegParser:
    @pytest.mark.parametrize(
        "ss,css",
        [
            ("410", ChromaSubsampling.CSS_410),
            ("411", ChromaSubsampling.CSS_411),
            ("420", ChromaSubsampling.CSS_420),
            ("422", ChromaSubsampling.CSS_422),
            ("440", ChromaSubsampling.CSS_440),
            ("444", ChromaSubsampling.CSS_444),
        ],
    )
    def test_chroma(self, corpus, ss, css):
        info = info_of(str(corpus / "jpeg" / f"photo_{ss}.jpg"))
        assert info.codec == "jpeg"
        assert info.chroma_subsampling == css
        assert (info.width, info.height) == (640, 426)
        assert info.jpeg_encoding == JpegEncoding.BASELINE_DCT

    def test_410v_mapping(self):
        # 2x4 luma sampling -> 410V (reference: src/parsers/jpeg.cpp:104-106)
        from nvimagecodec_tpu.parsers.jpeg import sampling_to_css

        assert (
            sampling_to_css([(2, 4), (1, 1), (1, 1)])
            == ChromaSubsampling.CSS_410V
        )

    def test_gray(self, corpus):
        info = info_of(str(corpus / "jpeg" / "photo_gray.jpg"))
        assert info.chroma_subsampling == ChromaSubsampling.GRAY
        assert info.num_planes == 1
        assert info.color_spec == ColorSpec.GRAY

    def test_progressive(self, corpus):
        info = info_of(str(corpus / "jpeg" / "photo_progressive.jpg"))
        assert info.jpeg_encoding == JpegEncoding.PROGRESSIVE_DCT_HUFFMAN

    @pytest.mark.parametrize("o", list(range(1, 9)))
    def test_exif_orientation(self, corpus, o):
        data = add_exif_orientation(
            (corpus / "jpeg" / "photo_420.jpg").read_bytes(), o
        )
        info = info_of(data)
        assert info.orientation == Orientation(o)


class TestPngParser:
    def test_rgb(self, corpus):
        info = info_of(str(corpus / "png" / "photo.png"))
        assert info.codec == "png"
        assert (info.width, info.height) == (640, 426)
        assert info.num_planes == 3

    def test_gray(self, corpus):
        info = info_of(str(corpus / "png" / "photo_gray.png"))
        assert info.num_planes == 1

    def test_alpha(self, corpus):
        info = info_of(str(corpus / "png" / "photo_alpha.png"))
        assert info.num_planes == 4

    def test_16bit(self, corpus):
        info = info_of(str(corpus / "png" / "photo_16bit.png"))
        assert info.sample_type == SampleDataType.UINT16


class TestBmpParser:
    def test_rgb(self, corpus):
        info = info_of(str(corpus / "bmp" / "photo.bmp"))
        assert info.codec == "bmp"
        assert (info.width, info.height) == (640, 426)
        assert info.num_planes == 3

    def test_grayscale(self, corpus):
        info = info_of(str(corpus / "bmp" / "photo_gray.bmp"))
        assert info.num_planes == 1


class TestPnmParser:
    def test_ppm(self, corpus):
        info = info_of(str(corpus / "pnm" / "photo.ppm"))
        assert info.codec == "pnm"
        assert info.num_planes == 3

    def test_pgm(self, corpus):
        info = info_of(str(corpus / "pnm" / "photo_gray.pgm"))
        assert info.num_planes == 1

    def test_ascii_ppm(self):
        data = b"P3\n# comment\n2 2\n255\n" + b" ".join(
            str(v).encode() for v in range(12)
        )
        info = info_of(data)
        assert (info.width, info.height) == (2, 2)


class TestWebpParser:
    def test_lossy(self, corpus):
        info = info_of(str(corpus / "webp" / "photo_lossy.webp"))
        assert info.codec == "webp"
        assert (info.width, info.height) == (640, 426)
        assert not info.extras["webp_lossless"]

    def test_lossless(self, corpus):
        info = info_of(str(corpus / "webp" / "photo_lossless.webp"))
        assert info.extras["webp_lossless"]
        assert (info.width, info.height) == (640, 426)


class TestJpeg2kColrBox:
    """JP2 colr box -> ImageInfo.color_spec (reference:
    src/parsers/jpeg2k.cpp:246-268). Streams come from openjpeg, not our
    own encoder, so the box walk is validated against a real producer."""

    @staticmethod
    def _opj_jp2(nc, clrspc, sub=None):
        import oracle  # noqa: F401 (ensures tests path wiring)
        from nvimagecodec_tpu.native import opj_bridge

        rng = np.random.default_rng(7)
        sub = sub or [(1, 1)] * nc
        planes = [
            rng.integers(0, 256, (32 // dy, 48 // dx)).astype(np.int32)
            for (dx, dy) in sub
        ]
        return opj_bridge.encode_planes(
            planes, sub, stream_type="jp2", clrspc=clrspc, size=(32, 48))

    def test_srgb(self):
        info = info_of(self._opj_jp2(3, clrspc=1))
        assert info.color_spec == ColorSpec.SRGB

    def test_gray(self):
        info = info_of(self._opj_jp2(1, clrspc=2))
        assert info.color_spec == ColorSpec.GRAY

    def test_sycc(self):
        info = info_of(
            self._opj_jp2(3, clrspc=3, sub=[(1, 1), (2, 2), (2, 2)]))
        assert info.color_spec == ColorSpec.SYCC

    def test_icc_method_unsupported(self):
        # method-2 (restricted ICC) colr box -> UNSUPPORTED, matching the
        # reference rather than silently assuming sRGB
        data = bytearray(self._opj_jp2(3, clrspc=1))
        i = bytes(data).find(b"colr")
        assert i > 0
        data[i + 4] = 2  # METH byte: enumerated -> restricted ICC
        info = info_of(bytes(data))
        assert info.color_spec == ColorSpec.UNSUPPORTED

    def test_raw_codestream_has_no_box(self):
        from nvimagecodec_tpu.parsers.jpeg2k import jp2_color_info

        from nvimagecodec_tpu.codecs.jpeg2000.core import encode_j2k

        s = encode_j2k(make_photo(32, 48, seed=1), reversible=True,
                       levels=2, stream_type="j2k")
        assert jp2_color_info(s) is None
        # and a codestream whose BODY contains the bytes b"colr" must not
        # fool the walk (the old byte-find heuristic could)
        assert b"jp2h" not in s[:64]
