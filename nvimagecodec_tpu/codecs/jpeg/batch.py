"""Batched TPU decode path: geometry-bucketed jitted pixel stage.

The XLA analog of the reference's batched GPU decode
(extensions/nvjpeg/hw_decoder.cpp nvjpegDecodeBatched): samples that share a
geometry (dims + sampling + quant tables) are stacked and run through ONE
jitted pixel function — variable shapes become shape buckets instead of
per-sample dynamic dispatch (SURVEY.md §7 "Variable shapes under XLA").
Batch sizes are padded to powers of two to bound recompilation.
"""
from __future__ import annotations

import functools
from typing import Dict, List

import numpy as np

from ...core.interfaces import DecodeParams, DecodeResult
from ...core.types import ProcessingStatus
from .headers import parse_jpeg_structure
from .pixel import cmyk_to_rgb, decode_pixels, geometry_key


@functools.lru_cache(maxsize=256)
def _pixel_fn(geom_key, batch: int, fancy: bool):
    """Build + jit the pixel stage for one geometry bucket.

    The frame carried in the key is reconstructed from the first sample at
    call time; geom_key only serves as the cache key.
    """
    import jax

    def fn(frame, coef_arrays):
        return decode_pixels(frame, coef_arrays, use_jax=True, fancy=fancy)

    # static frame via closure: jit caches on geom_key through this lru_cache
    jitted = {}

    def call(frame, coef_arrays):
        if "f" not in jitted:
            jitted["f"] = jax.jit(lambda arrs: fn(frame, arrs))
        return jitted["f"](coef_arrays)

    return call


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def decode_batch_tpu(data_batch, params: DecodeParams) -> List[DecodeResult]:
    n = len(data_batch)
    results: List[DecodeResult] = [None] * n  # type: ignore[list-item]

    # 1) host: parse + entropy decode, fanned over CPU cores (the native
    #    decoder releases the GIL inside the ctypes call — the analog of the
    #    reference's executor fan-out, extensions/nvjpeg/cuda_decoder.cpp:565-571)
    import os
    from concurrent.futures import ThreadPoolExecutor

    from . import _entropy_decode  # late import to avoid cycle

    def _host_stage(item):
        i, data = item
        raw = bytes(data)
        frame = parse_jpeg_structure(raw)
        coefs = _entropy_decode(frame, raw)
        return i, frame, coefs

    parsed = {}
    groups: Dict[tuple, list] = {}
    nthreads = min(len(data_batch), os.cpu_count() or 2)
    if nthreads > 1:
        ex = ThreadPoolExecutor(max_workers=nthreads)
        futures = [ex.submit(_host_stage, (i, d)) for i, d in enumerate(data_batch)]
        outcomes = []
        for i, f in enumerate(futures):
            try:
                outcomes.append(f.result())
            except Exception as e:
                results[i] = DecodeResult(
                    ProcessingStatus.FAIL | ProcessingStatus.IMAGE_CORRUPTED,
                    error=str(e),
                )
        ex.shutdown(wait=False)
    else:
        outcomes = []
        for i, d in enumerate(data_batch):
            try:
                outcomes.append(_host_stage((i, d)))
            except Exception as e:
                results[i] = DecodeResult(
                    ProcessingStatus.FAIL | ProcessingStatus.IMAGE_CORRUPTED,
                    error=str(e),
                )
    for i, frame, coefs in outcomes:
        parsed[i] = (frame, coefs)
        groups.setdefault(geometry_key(frame), []).append(i)

    # 2) device: one jitted call per geometry bucket
    import jax

    for key, idxs in groups.items():
        frame0 = parsed[idxs[0]][0]
        ncomp = len(frame0.components)
        b = len(idxs)
        bpad = _next_pow2(b)
        coef_arrays = []
        for c in range(ncomp):
            stack = np.stack([parsed[i][1][c] for i in idxs])
            if bpad != b:
                pad = np.zeros((bpad - b, *stack.shape[1:]), stack.dtype)
                stack = np.concatenate([stack, pad])
            coef_arrays.append(stack)
        try:
            call = _pixel_fn(key, bpad, True)
            imgs = call(frame0, tuple(coef_arrays))
            if imgs.ndim == 4 and imgs.shape[-1] == 4:
                import jax.numpy as jnp

                imgs = cmyk_to_rgb(imgs, jnp)
            for j, i in enumerate(idxs):
                results[i] = DecodeResult(ProcessingStatus.SUCCESS, imgs[j])
        except Exception as e:
            for i in idxs:
                results[i] = DecodeResult(ProcessingStatus.FAIL, error=str(e))
    return results
