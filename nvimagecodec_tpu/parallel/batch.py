"""Sharded batched JPEG pixel stage: DP over images, SP over block rows.

The distributed analog of the reference's batched decode
(extensions/nvjpeg/hw_decoder.cpp nvjpegDecodeBatched): coefficient batches
are sharded over the "dp" mesh axis so each chip runs the fused
dequant+IDCT+upsample+color pipeline on its shard; no cross-chip
communication is needed for independent images (embarrassingly parallel, so
collectives only appear in the tile-parallel J2K path, parallel/tiles.py).
"""
from __future__ import annotations

from typing import List

import numpy as np


def shard_decode_fn(frame, mesh):
    """Build a pjit'd pixel-stage function with the coefficient batch sharded
    over 'dp'. frame geometry is baked as compile-time constants."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..codecs.jpeg.pixel import decode_pixels

    in_shard = NamedSharding(mesh, P("dp"))
    out_shard = NamedSharding(mesh, P("dp"))

    def fn(coef_arrays):
        return decode_pixels(frame, list(coef_arrays), use_jax=True)

    return jax.jit(
        fn,
        in_shardings=((in_shard,) * len(frame.components),),
        out_shardings=out_shard,
    )


def decode_batch_sharded(frame, coef_stacks: List[np.ndarray], mesh):
    """coef_stacks[c]: [B, bh, bw, 64] with B divisible by mesh 'dp' size."""
    fn = shard_decode_fn(frame, mesh)
    return fn(tuple(coef_stacks))
