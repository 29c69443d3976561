"""Pallas TPU kernels for the JPEG pixel stage.

Fused dequant+IDCT kernel: one grid step runs one block row of one image —
the [bw, 64] int16 coefficient slab is cast, matmul'd against the folded
dequant·IDCT matrix on the MXU, level-shifted, rounded and clipped to int32
in a single VMEM-resident pass (the XLA path materializes the f32 matmul
result to HBM before the round/clip/layout chain). Block→raster layout
stays in XLA: Mosaic does not support the (bw, 8, 8)→(8, bw*8) shape cast,
and that transpose is cheap bandwidth-wise on int32.

Written per /opt/skills/guides/pallas_guide.md (VMEM block specs,
preferred_element_type on the MXU dot, static shapes, grid over
(batch, block_row)). Callers fall back to the XLA einsum on any failure.
"""
from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=64)
def _build_idct_blocks_fn(batch: int, bh: int, bw: int, K: int, maxval: int,
                          center: float):
    """pallas_call for fixed geometry: [B, bh, bw, K] i16 → [B, bh, bw, 64]
    i32 IDCT samples (block layout, clipped). K may be a truncated zigzag
    prefix (the wire drops always-zero tail coefficients; the matrix
    contraction simply has fewer terms)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(coef_ref, m_ref, out_ref):
        x = coef_ref[0, 0].astype(jnp.float32)  # [bw, K] (VPU cast)
        samp = (
            jnp.dot(x, m_ref[:], preferred_element_type=jnp.float32) + center
        )
        out_ref[0, 0] = jnp.clip(jnp.round(samp), 0, maxval).astype(jnp.int32)

    return pl.pallas_call(
        kernel,
        grid=(batch, bh),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bw, K),
                lambda b, r: (b, r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (K, 64), lambda b, r: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bw, 64),
            lambda b, r: (b, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, bh, bw, 64), jnp.int32),
    )


def dequant_idct_blocks(coefs, M: np.ndarray, precision: int = 8):
    """[B, bh, bw, K] int16 → [B, bh, bw, 64] int32 clipped samples.

    M is dequant_idct_matrix(quant) sliced to [64(pix), K(coef)]; the kernel
    takes M^T so the contraction is coefficient-major on the MXU.
    """
    import jax.numpy as jnp

    batch, bh, bw, K = coefs.shape
    maxval = (1 << precision) - 1
    center = float(1 << (precision - 1))
    fn = _build_idct_blocks_fn(batch, bh, bw, K, maxval, center)
    return fn(coefs, jnp.asarray(np.ascontiguousarray(M.T), jnp.float32))
