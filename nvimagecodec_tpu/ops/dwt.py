"""Discrete wavelet transforms for JPEG2000 (ITU-T T.800 Annex F).

TPU-native counterpart of the DWT stages nvjpeg2k runs on GPU in the
reference (extensions/nvjpeg2k/cuda_decoder.cpp). Lifting is expressed as
vectorized strided adds over [..., H, W] planes — pure VPU work that XLA
fuses across steps; both numpy (CPU backend) and jax (TPU backend) run the
same code. All ops are batch-agnostic (arbitrary leading dims).

- 5/3 reversible: integer lifting, bit-exact invertible (lossless path).
- 9/7 irreversible: float lifting with the standard α β γ δ K constants.

Boundary handling is whole-sample symmetric extension; odd lengths and
subband parity follow the spec's interleaved formulation (low samples at
even positions of the reconstructed signal when the segment starts at an
even coordinate).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

ALPHA = -1.586134342059924
BETA = -0.052980118572961
GAMMA = 0.882911075530934
DELTA = 0.443506852043971
K = 1.230174104914001


def _xp(a):
    if isinstance(a, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def _reflect_pad1(x, axis: int):
    """Pad 1 sample on both ends of `axis` with whole-sample reflection
    (..., a, b, c, ... -> b, a, b, c, ..., y, z, y)."""
    xp = _xp(x)
    n = x.shape[axis]
    if n == 1:
        first = xp.take(x, np.array([0]), axis=axis)
        return xp.concatenate([first, x, first], axis=axis)
    left = xp.take(x, np.array([1]), axis=axis)
    right = xp.take(x, np.array([n - 2]), axis=axis)
    return xp.concatenate([left, x, right], axis=axis)


def _split_even_odd(x, axis: int):
    xp = _xp(x)
    n = x.shape[axis]
    idx_e = np.arange(0, n, 2)
    idx_o = np.arange(1, n, 2)
    return xp.take(x, idx_e, axis=axis), xp.take(x, idx_o, axis=axis)


def _interleave(xp, even, odd, axis: int, n: int):
    """Merge even/odd samples back into a length-n axis."""
    shape = list(even.shape)
    shape[axis] = n
    if xp is np:
        out = np.empty(shape, even.dtype)
        sl_e = [slice(None)] * out.ndim
        sl_o = [slice(None)] * out.ndim
        sl_e[axis] = slice(0, n, 2)
        sl_o[axis] = slice(1, n, 2)
        out[tuple(sl_e)] = even
        out[tuple(sl_o)] = odd
        return out
    out = xp.zeros(shape, even.dtype)
    sl_e = [slice(None)] * len(shape)
    sl_o = [slice(None)] * len(shape)
    sl_e[axis] = slice(0, n, 2)
    sl_o[axis] = slice(1, n, 2)
    out = out.at[tuple(sl_e)].set(even)
    out = out.at[tuple(sl_o)].set(odd)
    return out


def _nb(x, axis, lo: bool):
    """Neighbor pairs for lifting: for each position i in the target subset,
    (x[i-1], x[i+1]) with reflection — implemented by shifting a padded
    copy."""
    raise NotImplementedError  # not used; kept for clarity of derivation


# -- 1D lifting on the interleaved signal ----------------------------------

def _fwd_lift_53(x, axis: int):
    """Analysis on one axis: returns (L, H) along that axis (integer)."""
    xp = _xp(x)
    n = x.shape[axis]
    if n == 1:
        return x, xp.take(x, np.array([], np.int64), axis=axis)
    p = _reflect_pad1(x, axis)  # indices shifted by +1
    # d[i] for odd positions: x[2k+1] - floor((x[2k] + x[2k+2]) / 2)
    even, odd = _split_even_odd(x, axis)
    ne = even.shape[axis]
    no = odd.shape[axis]
    # right neighbor of odd position 2k+1 is even sample k+1 (reflect at end)
    idx_r = np.minimum(np.arange(no) + 1, ne - 1)
    even_c = xp.take(even, np.arange(no), axis=axis) if ne != no else even
    even_r = xp.take(even, idx_r, axis=axis)
    H = odd - ((even_c + even_r) >> 1)
    # s[k] = x[2k] + floor((d[k-1] + d[k] + 2) / 4); reflect d at both ends
    idx_l = np.maximum(np.arange(ne) - 1, 0)
    idx_c = np.minimum(np.arange(ne), no - 1)
    if no == 0:
        return even, odd
    H_l = xp.take(H, idx_l, axis=axis)
    H_c = xp.take(H, idx_c, axis=axis)
    # for even position 0, left neighbor d[-1] reflects to d[0]
    L = even + ((H_l + H_c + 2) >> 2)
    return L, H


def _inv_lift_53(L, H, axis: int, n: int):
    """Synthesis on one axis from subbands (integer, exact inverse)."""
    xp = _xp(L)
    ne = L.shape[axis]
    no = H.shape[axis]
    if no == 0:
        return L
    idx_l = np.maximum(np.arange(ne) - 1, 0)
    idx_c = np.minimum(np.arange(ne), no - 1)
    H_l = xp.take(H, idx_l, axis=axis)
    H_c = xp.take(H, idx_c, axis=axis)
    even = L - ((H_l + H_c + 2) >> 2)
    idx_r = np.minimum(np.arange(no) + 1, ne - 1)
    even_c = xp.take(even, np.arange(no), axis=axis) if ne != no else even
    even_r = xp.take(even, idx_r, axis=axis)
    odd = H + ((even_c + even_r) >> 1)
    return _interleave(xp, even, odd, axis, n)


def _fwd_lift_97(x, axis: int):
    xp = _xp(x)
    n = x.shape[axis]
    if n == 1:
        return x, xp.take(x, np.array([], np.int64), axis=axis)
    even, odd = _split_even_odd(x, axis)
    ne, no = even.shape[axis], odd.shape[axis]
    if no == 0:
        return even, odd
    er = np.minimum(np.arange(no) + 1, ne - 1)
    el = np.maximum(np.arange(ne) - 1, 0)
    ec = np.minimum(np.arange(ne), no - 1)

    def ev_c(e):
        return xp.take(e, np.arange(no), axis=axis) if ne != no else e

    odd = odd + ALPHA * (ev_c(even) + xp.take(even, er, axis=axis))
    even = even + BETA * (xp.take(odd, el, axis=axis) + xp.take(odd, ec, axis=axis))
    odd = odd + GAMMA * (ev_c(even) + xp.take(even, er, axis=axis))
    even = even + DELTA * (xp.take(odd, el, axis=axis) + xp.take(odd, ec, axis=axis))
    L = even * (1.0 / K)
    H = odd * K
    return L, H


def _inv_lift_97(L, H, axis: int, n: int):
    xp = _xp(L)
    ne = L.shape[axis]
    no = H.shape[axis]
    if no == 0:
        return L
    er = np.minimum(np.arange(no) + 1, ne - 1)
    el = np.maximum(np.arange(ne) - 1, 0)
    ec = np.minimum(np.arange(ne), no - 1)

    def ev_c(e):
        return xp.take(e, np.arange(no), axis=axis) if ne != no else e

    even = L * K
    odd = H * (1.0 / K)
    even = even - DELTA * (xp.take(odd, el, axis=axis) + xp.take(odd, ec, axis=axis))
    odd = odd - GAMMA * (ev_c(even) + xp.take(even, er, axis=axis))
    even = even - BETA * (xp.take(odd, el, axis=axis) + xp.take(odd, ec, axis=axis))
    odd = odd - ALPHA * (ev_c(even) + xp.take(even, er, axis=axis))
    return _interleave(xp, even, odd, axis, n)


# -- 2D separable, single level --------------------------------------------

def dwt2d_level(x, reversible: bool):
    """One analysis level on [..., H, W] → (LL, HL, LH, HH).

    T.800 order: COLUMNS are filtered first, then rows (integer lifting
    does not commute, so the order is normative — validated bit-exact
    against openjpeg). HL = horizontally-highpass (X high, Y low), LH =
    vertically-highpass, matching the spec's subband naming.
    """
    f = _fwd_lift_53 if reversible else _fwd_lift_97
    Ly, Hy = f(x, -2)
    LL, HL = f(Ly, -1)
    LH, HH = f(Hy, -1)
    return LL, HL, LH, HH


def idwt2d_level(LL, HL, LH, HH, out_h: int, out_w: int, reversible: bool):
    """Inverse of dwt2d_level for a [..., out_h, out_w] target."""
    g = _inv_lift_53 if reversible else _inv_lift_97
    Ly = g(LL, HL, -1, out_w)
    Hy = g(LH, HH, -1, out_w)
    return g(Ly, Hy, -2, out_h)


def subband_dims(h: int, w: int, levels: int) -> List[Tuple[int, int]]:
    """[(h, w)] of the LL at each level 0..levels (level 0 = original)."""
    dims = [(h, w)]
    for _ in range(levels):
        h = (h + 1) // 2
        w = (w + 1) // 2
        dims.append((h, w))
    return dims


def dwt2d(x, levels: int, reversible: bool):
    """Multi-level analysis. Returns (LL, [(HL, LH, HH) per level,
    finest-first])."""
    bands = []
    cur = x
    for _ in range(levels):
        LL, HL, LH, HH = dwt2d_level(cur, reversible)
        bands.append((HL, LH, HH))
        cur = LL
    return cur, bands


def idwt2d(LL, bands, out_shape: Tuple[int, int], reversible: bool):
    """Inverse of dwt2d. bands finest-first; out_shape = (H, W)."""
    levels = len(bands)
    dims = subband_dims(out_shape[0], out_shape[1], levels)
    cur = LL
    for lev in range(levels - 1, -1, -1):
        HL, LH, HH = bands[lev]
        h, w = dims[lev]
        cur = idwt2d_level(cur, HL, LH, HH, h, w, reversible)
    return cur
