"""Image resize ops for the processing pipeline (improc).

Counterpart of the CV-CUDA crop/resize stage in the reference's nvimproc
sample (example/nvimproc/main.cpp:150-331). Gather-based bilinear resize,
batch-agnostic over [..., H, W] or [..., H, W, C]; same code runs under
numpy and jax (XLA lowers the gathers + lerps onto the VPU)."""
from __future__ import annotations

import numpy as np


def _xp(a):
    if isinstance(a, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def resize_bilinear(img, out_h: int, out_w: int):
    """Half-pixel-centers bilinear resize (align_corners=False, the OpenCV /
    CV-CUDA convention). Channel dim (if any) must be last."""
    xp = _xp(img)
    has_c = img.ndim >= 3
    h, w = (img.shape[-3], img.shape[-2]) if has_c else (img.shape[-2], img.shape[-1])

    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int32)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int32)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0).astype(np.float32)
    wx = np.clip(xs - x0, 0.0, 1.0).astype(np.float32)

    axis_y = -3 if has_c else -2
    axis_x = -2 if has_c else -1
    r0 = xp.take(img, y0, axis=axis_y)
    r1 = xp.take(img, y1, axis=axis_y)
    p00 = xp.take(r0, x0, axis=axis_x).astype(xp.float32)
    p01 = xp.take(r0, x1, axis=axis_x).astype(xp.float32)
    p10 = xp.take(r1, x0, axis=axis_x).astype(xp.float32)
    p11 = xp.take(r1, x1, axis=axis_x).astype(xp.float32)

    wy_b = wy[:, None, None] if has_c else wy[:, None]
    wx_b = wx[None, :, None] if has_c else wx[None, :]
    # broadcast over any leading batch dims
    while wy_b.ndim < p00.ndim:
        wy_b = wy_b[None]
        wx_b = wx_b[None]

    top = p00 + (p01 - p00) * wx_b
    bot = p10 + (p11 - p10) * wx_b
    out = top + (bot - top) * wy_b
    if np.issubdtype(np.dtype(str(img.dtype)), np.integer):
        maxv = 65535 if img.dtype == np.uint16 else 255
        return xp.clip(xp.round(out), 0, maxv).astype(img.dtype)
    return out


def crop(img, x: int, y: int, w: int, h: int):
    """Spatial crop with channel-last convention."""
    if img.ndim >= 3:
        return img[..., y : y + h, x : x + w, :]
    return img[..., y : y + h, x : x + w]


# -- separable filtered resize (bicubic / Lanczos) --------------------------
#
# The geometry breadth of the reference's imgproc/CV-CUDA resize stage
# (example/nvimproc uses CV-CUDA interpolation modes). Separable: per axis,
# a [out, taps] weight matrix + tap indices, applied as gather + weighted
# sum — XLA fuses this onto the VPU, numpy vectorizes it on host.

def _cubic_kernel(t: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic (a = -0.5: Catmull-Rom, the OpenCV INTER_CUBIC kernel)."""
    t = np.abs(t)
    t2, t3 = t * t, t * t * t
    w = np.where(
        t <= 1, (a + 2) * t3 - (a + 3) * t2 + 1,
        np.where(t < 2, a * t3 - 5 * a * t2 + 8 * a * t - 4 * a, 0.0))
    return w.astype(np.float32)


def _lanczos_kernel(t: np.ndarray, a: int = 4) -> np.ndarray:
    """Lanczos windowed sinc (a = 4: the OpenCV INTER_LANCZOS4 kernel)."""
    t = np.abs(t)
    w = np.sinc(t) * np.sinc(t / a)
    return np.where(t < a, w, 0.0).astype(np.float32)


def _axis_weights(n_in: int, n_out: int, taps: int, kernel):
    """Half-pixel-centers tap indices [n_out, taps] + normalized weights."""
    centers = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    base = np.floor(centers).astype(np.int64) - (taps // 2 - 1)
    offs = np.arange(taps)
    idx = base[:, None] + offs[None, :]
    w = kernel(idx - centers[:, None])
    w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-8)
    return np.clip(idx, 0, n_in - 1).astype(np.int32), w.astype(np.float32)


def _resize_separable(img, out_h: int, out_w: int, taps: int, kernel):
    xp = _xp(img)
    has_c = img.ndim >= 3
    h, w = ((img.shape[-3], img.shape[-2]) if has_c
            else (img.shape[-2], img.shape[-1]))
    axis_y = -3 if has_c else -2
    axis_x = -2 if has_c else -1
    out = img.astype(xp.float32)
    for axis, n_in, n_out in ((axis_y, h, out_h), (axis_x, w, out_w)):
        idx, wts = _axis_weights(n_in, n_out, taps, kernel)
        acc = None
        for t in range(taps):
            tap = xp.take(out, idx[:, t], axis=axis)
            wb = wts[:, t]
            shape = [1] * out.ndim
            shape[axis] = n_out
            tap = tap * wb.reshape(shape)
            acc = tap if acc is None else acc + tap
        out = acc
    if np.issubdtype(np.dtype(str(img.dtype)), np.integer):
        maxv = 65535 if img.dtype == np.uint16 else 255
        return xp.clip(xp.round(out), 0, maxv).astype(img.dtype)
    return out


def resize_bicubic(img, out_h: int, out_w: int):
    """Catmull-Rom bicubic resize (OpenCV INTER_CUBIC convention)."""
    return _resize_separable(img, out_h, out_w, 4, _cubic_kernel)


def resize_lanczos(img, out_h: int, out_w: int):
    """Lanczos-4 resize (OpenCV INTER_LANCZOS4 convention)."""
    return _resize_separable(img, out_h, out_w, 8, _lanczos_kernel)


def resize(img, out_h: int, out_w: int, interp: str = "bilinear"):
    """Dispatch by interpolation name: bilinear | bicubic | lanczos."""
    if interp == "bilinear":
        return resize_bilinear(img, out_h, out_w)
    if interp == "bicubic":
        return resize_bicubic(img, out_h, out_w)
    if interp == "lanczos":
        return resize_lanczos(img, out_h, out_w)
    raise ValueError(f"unknown interpolation {interp!r}")


def rotate90(img, k: int = 1):
    """Rotate by k*90 degrees counter-clockwise (channel-last)."""
    xp = _xp(img)
    axes = (-3, -2) if img.ndim >= 3 else (-2, -1)
    return xp.rot90(img, k % 4, axes=axes)


def flip(img, horizontal: bool = False, vertical: bool = False):
    """Mirror along the spatial axes (channel-last)."""
    xp = _xp(img)
    ay, ax = ((-3, -2) if img.ndim >= 3 else (-2, -1))
    if vertical:
        img = xp.flip(img, axis=ay)
    if horizontal:
        img = xp.flip(img, axis=ax)
    return img
