"""Output sample-format / dtype conversion matrix
(reference: src/imgproc/convert_kernel_gpu.cu:30-290 layout×dtype matrix,
src/imgproc/convert.h ConvertSatNorm semantics)."""
import numpy as np
import pytest

from util import make_photo

import nvimagecodec_tpu as nic
from nvimagecodec_tpu.core.types import SampleDataType, SampleFormat
from nvimagecodec_tpu.ops.convert import convert_dtype, convert_format

oracle = pytest.importorskip("oracle")


@pytest.fixture(scope="module")
def photo():
    return make_photo(33, 47, seed=7)


@pytest.fixture(scope="module")
def png(photo):
    return oracle.png_encode(photo)


def test_planar_rgb_output(png, photo):
    out = nic.Decoder().decode(
        png, nic.DecodeParams(sample_format=SampleFormat.P_RGB)
    )
    a = np.asarray(out)
    assert a.shape == (3, 33, 47)
    assert np.array_equal(a, photo.transpose(2, 0, 1))


def test_interleaved_bgr_output(png, photo):
    a = np.asarray(
        nic.Decoder().decode(png, nic.DecodeParams(sample_format=SampleFormat.I_BGR))
    )
    assert np.array_equal(a, photo[..., ::-1])


def test_planar_bgr_output(png, photo):
    a = np.asarray(
        nic.Decoder().decode(png, nic.DecodeParams(sample_format=SampleFormat.P_BGR))
    )
    assert np.array_equal(a, photo[..., ::-1].transpose(2, 0, 1))


def test_p_y_matches_gray_colorspec(png):
    dec = nic.Decoder()
    py = np.asarray(dec.decode(png, nic.DecodeParams(sample_format=SampleFormat.P_Y)))
    gray = np.asarray(
        dec.decode(png, nic.DecodeParams(color_spec=nic.ColorSpec.GRAY))
    )
    assert py.ndim == 2
    assert np.array_equal(py, gray.reshape(py.shape))


def test_p_yuv_output(png, photo):
    a = np.asarray(
        nic.Decoder().decode(png, nic.DecodeParams(sample_format=SampleFormat.P_YUV))
    )
    assert a.shape == (3, 33, 47)
    # libjpeg-exact fixed point forward conversion is its own oracle here:
    from nvimagecodec_tpu.ops.color import rgb_to_ycbcr_i32

    y, cb, cr = rgb_to_ycbcr_i32(
        photo[..., 0], photo[..., 1], photo[..., 2], xp=np
    )
    assert np.array_equal(a, np.stack([y, cb, cr]).astype(np.uint8))


def test_gray_to_planar_rgb_broadcast(photo):
    """Gray sources requested as RGB broadcast the single channel
    (reference: the gray→RGB arm of the convert matrix)."""
    pgm = oracle.png_encode(photo[..., 0].copy())
    a = np.asarray(
        nic.Decoder().decode(pgm, nic.DecodeParams(sample_format=SampleFormat.P_RGB))
    )
    assert a.shape == (3, 33, 47)
    assert np.array_equal(a[0], a[1]) and np.array_equal(a[1], a[2])


# -- dtype conversion semantics (ConvertSatNorm) ------------------------------

def test_u8_to_u16_exact(png, photo):
    a = np.asarray(
        nic.Decoder().decode(png, nic.DecodeParams(sample_type=SampleDataType.UINT16))
    )
    assert a.dtype == np.uint16
    assert np.array_equal(a, photo.astype(np.uint16) * 257)


def test_u8_to_f32_normalized(png, photo):
    a = np.asarray(
        nic.Decoder().decode(png, nic.DecodeParams(sample_type=SampleDataType.FLOAT32))
    )
    assert a.dtype == np.float32
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert np.allclose(a, photo.astype(np.float32) / 255.0)


def test_u8_to_i16_fullscale(png, photo):
    a = np.asarray(
        nic.Decoder().decode(png, nic.DecodeParams(sample_type=SampleDataType.INT16))
    )
    assert a.dtype == np.int16
    assert np.array_equal(
        a, np.round(photo.astype(np.float32) * (32767.0 / 255.0)).astype(np.int16)
    )


def test_combined_format_and_dtype(png, photo):
    a = np.asarray(
        nic.Decoder().decode(
            png,
            nic.DecodeParams(
                sample_format=SampleFormat.P_RGB, sample_type=SampleDataType.FLOAT32
            ),
        )
    )
    assert a.shape == (3, 33, 47) and a.dtype == np.float32
    assert np.allclose(a, photo.transpose(2, 0, 1).astype(np.float32) / 255.0)


@pytest.mark.parametrize(
    "dst",
    [SampleDataType.UINT16, SampleDataType.FLOAT32, SampleDataType.INT16],
)
def test_dtype_roundtrip_identity(dst):
    v = np.arange(256, dtype=np.uint8).reshape(16, 16)
    wide = convert_dtype(v, dst)
    back = convert_dtype(wide, SampleDataType.UINT8)
    assert back.dtype == np.uint8
    assert np.array_equal(back, v)


def test_u16_to_u8_narrowing():
    v = np.array([0, 257, 65535, 32896], dtype=np.uint16)
    out = convert_dtype(v, SampleDataType.UINT8)
    assert np.array_equal(out, np.array([0, 1, 255, 128], dtype=np.uint8))


def test_float_saturation():
    v = np.array([-0.5, 0.0, 0.5, 1.0, 1.5], dtype=np.float32)
    out = convert_dtype(v, SampleDataType.UINT8)
    assert np.array_equal(out, np.array([0, 0, 128, 255, 255], dtype=np.uint8))


def test_jax_array_path_matches_numpy():
    import jax.numpy as jnp

    v = np.arange(64, dtype=np.uint8).reshape(4, 4, 4)[..., :3]
    jv = jnp.asarray(v)
    for dst in (SampleDataType.FLOAT32, SampleDataType.UINT16):
        assert np.array_equal(np.asarray(convert_dtype(jv, dst)), convert_dtype(v, dst))
    for fmt in (SampleFormat.P_RGB, SampleFormat.I_BGR, SampleFormat.P_Y):
        assert np.array_equal(
            np.asarray(convert_format(jv, fmt)), convert_format(v, fmt)
        )


# ------------------------------------------------ filtered resize (improc)
class TestFilteredResize:
    """Bicubic / Lanczos resize (the CV-CUDA interpolation-mode breadth of
    the reference's improc stage) — validated against an independent dense
    per-pixel evaluation of the same kernels, plus invariances."""

    def _dense_ref(self, img, out_h, out_w, kernel, taps):
        import numpy as np

        from nvimagecodec_tpu.ops.resize import _axis_weights

        h, w = img.shape[:2]
        iy, wy = _axis_weights(h, out_h, taps, kernel)
        ix, wx = _axis_weights(w, out_w, taps, kernel)
        tmp = np.einsum("ok,ko...->o...", wy,
                        img.astype(np.float32)[iy.T])
        out = np.einsum("ok,ako->ao", wx, tmp[:, ix.T])
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    def test_bicubic_matches_dense(self):
        import numpy as np

        from nvimagecodec_tpu.ops.resize import (
            _cubic_kernel,
            resize_bicubic,
        )

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (37, 53), np.uint8)
        got = resize_bicubic(img, 24, 80)
        ref = self._dense_ref(img, 24, 80, _cubic_kernel, 4)
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1

    def test_lanczos_matches_dense(self):
        import numpy as np

        from nvimagecodec_tpu.ops.resize import (
            _lanczos_kernel,
            resize_lanczos,
        )

        rng = np.random.default_rng(6)
        img = rng.integers(0, 256, (41, 29), np.uint8)
        got = resize_lanczos(img, 64, 64)
        ref = self._dense_ref(img, 64, 64, _lanczos_kernel, 8)
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1

    def test_invariances(self):
        import numpy as np

        from nvimagecodec_tpu.ops.resize import (
            flip,
            resize,
            resize_bicubic,
            resize_lanczos,
            rotate90,
        )

        # constant image stays constant under any filter
        const = np.full((20, 30, 3), 77, np.uint8)
        for fn in (resize_bicubic, resize_lanczos):
            out = fn(const, 33, 17)
            assert np.all(out == 77)
        # identity-size bicubic is exact (weights collapse to a delta)
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (16, 16, 3), np.uint8)
        assert np.array_equal(resize_bicubic(img, 16, 16), img)
        # rotate/flip roundtrips
        assert np.array_equal(rotate90(rotate90(img, 1), 3), img)
        assert np.array_equal(flip(flip(img, horizontal=True),
                                   horizontal=True), img)
        # dispatch
        assert resize(img, 8, 8, "lanczos").shape == (8, 8, 3)

    def test_jax_path_matches_numpy(self):
        import numpy as np

        from nvimagecodec_tpu.ops.resize import resize_bicubic

        jax = pytest.importorskip("jax")
        import jax.numpy as jnp

        rng = np.random.default_rng(8)
        img = rng.integers(0, 256, (24, 31, 3), np.uint8)
        a = resize_bicubic(img, 40, 18)
        b = np.asarray(resize_bicubic(jnp.asarray(img), 40, 18))
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
