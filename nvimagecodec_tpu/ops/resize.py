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
