"""Profiling spans — the NVTX-range analog.

The reference wraps every hot path in NVTX3 ranges (sortSamples,
processBatch, per-sample decode: src/image_generic_decoder.cpp:136,
src/decoder_worker.cpp:254, extensions/nvjpeg/cuda_decoder.cpp:415-547).
Here spans emit jax.profiler TraceAnnotations, which show up in the XLA
profiler / TensorBoard trace viewer alongside device activity; when the
profiler is unavailable they degrade to no-ops. `TPUIMGCODEC_TRACE=1`
additionally prints wall-clock span timings to stderr.
"""
from __future__ import annotations

import contextlib
import os
import sys
import time


_PRINT = bool(os.environ.get("TPUIMGCODEC_TRACE"))


@contextlib.contextmanager
def span(name: str):
    t0 = time.perf_counter() if _PRINT else 0.0
    ann = None
    try:
        import jax.profiler

        ann = jax.profiler.TraceAnnotation(name)
        ann.__enter__()
    except Exception:
        ann = None
    try:
        yield
    finally:
        if ann is not None:
            try:
                ann.__exit__(None, None, None)
            except Exception:
                pass
        if _PRINT:
            print(
                f"[trace] {name}: {(time.perf_counter() - t0) * 1000:.2f} ms",
                file=sys.stderr,
            )
