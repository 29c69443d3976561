"""8x8 DCT/IDCT as MXU matmuls.

TPU-native replacement for the DCT stages the reference delegates to nvjpeg
(the GPU IDCT inside nvjpegDecodeJpegDevice,
extensions/nvjpeg/cuda_decoder.cpp:539-556). Design: the 2-D 8x8 IDCT is
linear, so dequantization and the whole 2-D transform fold into ONE [64,64]
matrix per quant table; a batch of blocks becomes a single [N,64]x[64,64]
matmul — exactly the shape the MXU wants (SURVEY.md §7: "8x8 DCT/IDCT as
fused matmul kernels").
"""
from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _dct1d_basis() -> np.ndarray:
    """C[k, x] = c(k)/2 * cos((2x+1) k pi / 16); IDCT: s = C^T S."""
    k = np.arange(8)[:, None].astype(np.float64)
    x = np.arange(8)[None, :].astype(np.float64)
    c = np.where(k == 0, 1.0 / np.sqrt(2.0), 1.0)
    return (0.5 * c * np.cos((2 * x + 1) * k * np.pi / 16.0))


@functools.lru_cache(maxsize=None)
def idct_matrix_64() -> np.ndarray:
    """M such that vec(pixels) = M @ vec(coefs), both row-major 64-vectors.

    pixels = C^T @ S @ C  →  M = kron(C^T, C^T).
    """
    C = _dct1d_basis()
    return np.kron(C.T, C.T)  # float64 [64, 64]


@functools.lru_cache(maxsize=None)
def dct_matrix_64() -> np.ndarray:
    """Forward: vec(S) = D @ vec(pixels); D = kron(C, C)."""
    C = _dct1d_basis()
    return np.kron(C, C)


def dequant_idct_matrix(quant_natural: np.ndarray) -> np.ndarray:
    """Fold per-coefficient dequantization into the IDCT matrix:
    pixels = M @ (q * coef) = (M * q[None, :]) @ coef."""
    M = idct_matrix_64()
    return (M * quant_natural.astype(np.float64)[None, :]).astype(np.float32)


def quant_dct_matrix(quant_natural: np.ndarray) -> np.ndarray:
    """Forward DCT with quantization folded: coef_q ≈ (D / q[:, None]) @ pixels
    (caller rounds)."""
    D = dct_matrix_64()
    return (D / quant_natural.astype(np.float64)[:, None]).astype(np.float32)


def idct_blocks(coefs, quant_natural: np.ndarray, precision: int = 8):
    """Dequantize + IDCT a batch of blocks on device.

    coefs: [..., 64] int/float array (natural order), jax or numpy.
    Returns float32 [..., 64] sample values (level-shifted to [0, 2^p-1],
    unclipped — caller clips/rounds after upsample/color conversion to keep
    everything fused).
    """
    import jax.numpy as jnp

    M = dequant_idct_matrix(np.asarray(quant_natural))
    x = jnp.asarray(coefs, jnp.float32)
    center = float(1 << (precision - 1))
    return (
        jnp.einsum("...k,pk->...p", x, M, preferred_element_type=jnp.float32)
        + center
    )


def blocks_to_plane(blocks, blocks_h: int, blocks_w: int):
    """[bh*bw, 64] → [bh*8, bw*8] raster plane (jax or numpy)."""
    import jax.numpy as jnp

    x = jnp.reshape(blocks, (blocks_h, blocks_w, 8, 8))
    x = jnp.transpose(x, (0, 2, 1, 3))
    return jnp.reshape(x, (blocks_h * 8, blocks_w * 8))


def plane_to_blocks(plane, blocks_h: int, blocks_w: int):
    """[bh*8, bw*8] → [bh*bw, 64] (inverse of blocks_to_plane)."""
    import jax.numpy as jnp

    x = jnp.reshape(plane, (blocks_h, 8, blocks_w, 8))
    x = jnp.transpose(x, (0, 2, 1, 3))
    return jnp.reshape(x, (blocks_h * blocks_w, 64))
