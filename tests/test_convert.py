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
