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
import threading
import time


_PRINT = bool(os.environ.get("TPUIMGCODEC_TRACE"))

# optional in-process accumulation (bench attribution): totals[name] = secs
# for spans, counters[name] = value for add_count (e.g. H2D bytes).
# Updated from decode worker/transfer threads concurrently, so all
# mutations hold _COLLECT_LOCK (lost increments would skew the bench
# attribution numbers).
_COLLECT = None
_COLLECT_LOCK = threading.Lock()


def start_collect() -> None:
    """Begin accumulating span durations / counters process-wide."""
    global _COLLECT
    _COLLECT = {"spans": {}, "counters": {}}


def stop_collect() -> dict:
    """Stop accumulating; returns {"spans": {name: secs}, "counters": ...}."""
    global _COLLECT
    d = _COLLECT or {"spans": {}, "counters": {}}
    _COLLECT = None
    return d


def add_count(name: str, value) -> None:
    """Accumulate a counter (no-op unless collection is active)."""
    if _COLLECT is not None:
        with _COLLECT_LOCK:
            if _COLLECT is not None:
                c = _COLLECT["counters"]
                c[name] = c.get(name, 0) + value


@contextlib.contextmanager
def span(name: str):
    t0 = time.perf_counter() if (_PRINT or _COLLECT is not None) else 0.0
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
        if _COLLECT is not None and t0:
            with _COLLECT_LOCK:
                if _COLLECT is not None:
                    sp = _COLLECT["spans"]
                    sp[name] = sp.get(name, 0.0) + (
                        time.perf_counter() - t0)
        if _PRINT:
            print(
                f"[trace] {name}: {(time.perf_counter() - t0) * 1000:.2f} ms",
                file=sys.stderr,
            )
