"""Zero-copy interop tests: DLPack and array-interface round trips with
torch and numpy, plus .cpu()/.tpu() migration semantics.

Reference coverage analog: python/image.cpp:433-480 exports +
test/python/test_python.py:207-310 (as_image/migration no-copy fast paths)
+ integration/test_dlpack_torch.py."""
import numpy as np
import pytest

from util import make_photo

import nvimagecodec_tpu as nic
from nvimagecodec_tpu.image import Image, as_image


def test_array_interface_roundtrip():
    img = make_photo(30, 40, seed=1)
    im = as_image(img)
    assert im.buffer_kind == "strided_host"
    back = np.asarray(im)
    assert np.array_equal(back, img)
    # __array_interface__ exposes the host buffer
    assert im.__array_interface__["shape"] == (30, 40, 3)


def test_cpu_is_noop_on_host_image():
    img = make_photo(10, 12, seed=2)
    im = as_image(img)
    assert im.cpu() is im  # no-copy fast path (reference :207-310)


def test_tpu_migration_and_back():
    img = make_photo(16, 20, seed=3)
    im = as_image(img).tpu()
    assert im.buffer_kind == "strided_device"
    back = im.cpu()
    assert np.array_equal(np.asarray(back), img)


def test_dlpack_to_torch():
    torch = pytest.importorskip("torch")
    img = make_photo(24, 32, seed=4)
    im = as_image(img)
    t = torch.from_dlpack(im)
    assert t.shape == (24, 32, 3)
    assert np.array_equal(t.numpy(), img)


def test_dlpack_from_torch():
    torch = pytest.importorskip("torch")
    img = make_photo(18, 22, seed=5)
    t = torch.from_numpy(img.copy())
    im = as_image(t)
    assert np.array_equal(np.asarray(im), img)


def test_decoded_image_dlpack_chain():
    torch = pytest.importorskip("torch")
    import oracle

    img = make_photo(40, 56, seed=6)
    out = nic.Decoder().decode(oracle.png_encode(img))
    t = torch.from_dlpack(out.cpu())
    assert np.array_equal(t.numpy(), img)
