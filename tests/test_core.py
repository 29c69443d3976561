"""Orchestration-layer unit tests with mock plugins — the analog of the
reference's gmock-based core suite (test/decoder_worker_test.cpp,
codec_registry_test.cpp, processing_results_test.cpp,
test/api/can_decode_test.cpp): priority chains, canDecode filtering,
runtime per-sample fallback, load-hint saturation, backend allowlists, and
promise/future incremental completion."""
import threading
import time

import numpy as np
import pytest

from nvimagecodec_tpu.core.interfaces import (
    DecodeParams,
    DecodeResult,
    DecoderPlugin,
)
from nvimagecodec_tpu.core.promise import ProcessingResultsPromise
from nvimagecodec_tpu.core.registry import CodecRegistry
from nvimagecodec_tpu.core.scheduler import GenericDecoder
from nvimagecodec_tpu.core.types import (
    Backend,
    BackendKind,
    Priority,
    ProcessingStatus,
)
from nvimagecodec_tpu.parsers.bmp import BmpParser


class MockDecoder(DecoderPlugin):
    """Configurable fake decoder (the role of mock_image_decoder.h)."""

    codec = "bmp"

    def __init__(self, plugin_id, priority, kind=BackendKind.CPU_ONLY,
                 accept=True, fail_indices=()):
        self.plugin_id = plugin_id
        self.priority = priority
        self.backend_kind = kind
        self.accept = accept
        self.fail_indices = set(fail_indices)
        self.calls = []

    def can_decode(self, data_batch, info_batch, params):
        return [
            ProcessingStatus.SUCCESS
            if self.accept
            else ProcessingStatus.FAIL | ProcessingStatus.CODEC_UNSUPPORTED
            for _ in data_batch
        ]

    def decode_batch(self, data_batch, info_batch, params):
        self.calls.append(len(data_batch))
        out = []
        for i, _ in enumerate(data_batch):
            if i in self.fail_indices:
                out.append(DecodeResult(ProcessingStatus.FAIL, error="boom"))
            else:
                out.append(
                    DecodeResult(
                        ProcessingStatus.SUCCESS,
                        np.full((2, 2), ord(self.plugin_id[0]), np.uint8),
                    )
                )
        return out


def _registry(*decoders):
    reg = CodecRegistry()
    reg.codec("bmp").register_parser(BmpParser())
    for d in decoders:
        reg.codec("bmp").register_decoder(d)
    return reg


def _bmp_bytes(n=3):
    from nvimagecodec_tpu.codecs.bmp import encode_bmp

    return [encode_bmp(np.zeros((2, 2, 3), np.uint8)) for _ in range(n)]


def _streams(reg, blobs):
    from nvimagecodec_tpu.core.code_stream import CodeStream

    return [CodeStream(b, reg) for b in blobs]


def test_priority_order_and_first_wins():
    hi = MockDecoder("high", Priority.HIGH)
    lo = MockDecoder("low", Priority.NORMAL)
    reg = _registry(lo, hi)  # registration order must not matter
    dec = GenericDecoder(registry=reg)
    results = dec.decode_batch(_streams(reg, _bmp_bytes(2)), DecodeParams())
    assert all(r.status & ProcessingStatus.SUCCESS for r in results)
    assert all(np.asarray(r.array)[0, 0] == ord("h") for r in results)
    assert lo.calls == []


def test_can_decode_rejection_falls_through():
    hi = MockDecoder("high", Priority.HIGH, accept=False)
    lo = MockDecoder("low", Priority.NORMAL)
    reg = _registry(hi, lo)
    dec = GenericDecoder(registry=reg)
    results = dec.decode_batch(_streams(reg, _bmp_bytes(2)), DecodeParams())
    assert all(np.asarray(r.array)[0, 0] == ord("l") for r in results)


def test_runtime_per_sample_fallback():
    """Samples failing at runtime in the high-priority backend re-route to
    the fallback (reference: processCurrentResults,
    src/decoder_worker.cpp:158-199)."""
    hi = MockDecoder("high", Priority.HIGH, fail_indices={1})
    lo = MockDecoder("low", Priority.NORMAL)
    reg = _registry(hi, lo)
    dec = GenericDecoder(registry=reg)
    results = dec.decode_batch(_streams(reg, _bmp_bytes(3)), DecodeParams())
    vals = [np.asarray(r.array)[0, 0] for r in results]
    assert vals.count(ord("h")) == 2 and vals.count(ord("l")) == 1
    assert all(r.status & ProcessingStatus.SUCCESS for r in results)


def test_exhausted_chain_reports_failure():
    hi = MockDecoder("high", Priority.HIGH, fail_indices={0, 1, 2})
    reg = _registry(hi)
    dec = GenericDecoder(registry=reg)
    results = dec.decode_batch(_streams(reg, _bmp_bytes(3)), DecodeParams())
    assert all(not (r.status & ProcessingStatus.SUCCESS) for r in results)


def test_backend_allowlist():
    tpu = MockDecoder("tpuD", Priority.HIGH, kind=BackendKind.HYBRID_CPU_TPU)
    cpu = MockDecoder("cpuD", Priority.NORMAL, kind=BackendKind.CPU_ONLY)
    reg = _registry(tpu, cpu)
    dec = GenericDecoder(
        registry=reg, backends=[Backend(BackendKind.CPU_ONLY)]
    )
    results = dec.decode_batch(_streams(reg, _bmp_bytes(2)), DecodeParams())
    assert all(np.asarray(r.array)[0, 0] == ord("c") for r in results)


def test_load_hint_saturation():
    """A fractional load hint sends only ceil(hint*batch) samples to the
    backend; the rest saturate onto the fallback (reference:
    extensions/nvjpeg/hw_decoder.cpp:199,244)."""
    hw = MockDecoder("hw", Priority.HIGH, kind=BackendKind.HYBRID_CPU_TPU)
    cpu = MockDecoder("cpu", Priority.NORMAL, kind=BackendKind.CPU_ONLY)
    reg = _registry(hw, cpu)
    dec = GenericDecoder(
        registry=reg,
        backends=[
            Backend(BackendKind.HYBRID_CPU_TPU, load_hint=0.5),
            Backend(BackendKind.CPU_ONLY),
        ],
    )
    results = dec.decode_batch(_streams(reg, _bmp_bytes(4)), DecodeParams())
    vals = [np.asarray(r.array)[0, 0] for r in results]
    assert vals.count(ord("h")) == 2 and vals.count(ord("c")) == 2


def test_promise_incremental_wait_new():
    """wait_new returns newly-ready samples as they complete
    (reference: ProcessingResultsFuture::wait_new,
    src/processing_results.cpp:78-93)."""
    p = ProcessingResultsPromise(3)
    f = p.future()
    p.set(1, "b")

    got = f.wait_new(timeout=1.0)
    assert got == [(1, "b")]

    def later():
        time.sleep(0.05)
        p.set(0, "a")
        p.set(2, "c")

    t = threading.Thread(target=later)
    t.start()
    collected = dict(got)
    while len(collected) < 3:
        for i, v in f.wait_new(timeout=1.0):
            collected[i] = v
    t.join()
    assert collected == {0: "a", 1: "b", 2: "c"}
    assert f.wait_all() == ["a", "b", "c"]


def test_promise_double_set_rejected():
    p = ProcessingResultsPromise(1)
    p.set(0, "x")
    with pytest.raises(RuntimeError):
        p.set(0, "y")


def test_decoder_decode_async_incremental():
    """Public async API: future with wait_all/wait_new
    (reference: nvimgcodecDecoderDecode + nvimgcodecFutureWaitForAll)."""
    import oracle
    from util import make_photo

    import nvimagecodec_tpu as nic

    imgs = [make_photo(20, 24, seed=s) for s in range(3)]
    batch = [oracle.png_encode(i) for i in imgs] + [b"junk"]
    fut = nic.Decoder().decode_async(batch)
    results = fut.wait_all()
    assert len(results) == 4
    for i in range(3):
        assert results[i].status & ProcessingStatus.SUCCESS
        assert np.array_equal(np.asarray(results[i].array), imgs[i])
    assert not (results[3].status & ProcessingStatus.SUCCESS)


def test_user_executor():
    """A user-supplied executor replaces the internal pool
    (reference: UserExecutor, src/user_executor.h)."""
    import oracle
    from util import make_photo

    import nvimagecodec_tpu as nic

    class CountingExecutor:
        def __init__(self):
            self.inner = __import__("concurrent.futures", fromlist=["x"]).ThreadPoolExecutor(2)
            self.count = 0

        def submit(self, fn, *a, **kw):
            self.count += 1
            return self.inner.submit(fn, *a, **kw)

    ex = CountingExecutor()
    img = make_photo(20, 24, seed=1)
    dec = nic.Decoder(executor=ex)
    out = dec.decode(oracle.png_encode(img))
    assert np.array_equal(np.asarray(out), img)
    assert ex.count > 0


def test_wait_new_timeout_raises():
    """wait_new with nothing new within the timeout raises TimeoutError
    instead of silently returning [] (reference: waitForNew blocks,
    src/processing_results.cpp:78-93)."""
    import pytest

    from nvimagecodec_tpu.core.promise import ProcessingResultsPromise

    p = ProcessingResultsPromise(2)
    f = p.future()
    with pytest.raises(TimeoutError):
        f.wait_new(timeout=0.05)
    p.set(0, "a")
    assert f.wait_new(timeout=1.0) == [(0, "a")]
    with pytest.raises(TimeoutError):
        f.wait_new(timeout=0.05)  # sample 1 still pending
    p.set(1, "b")
    assert f.wait_new(timeout=1.0) == [(1, "b")]
    assert f.wait_new(timeout=1.0) == []  # all consumed: immediate []


def test_priority_thread_pool_ordering():
    """Higher priority work runs first, FIFO within a level
    (reference: ThreadPool priority work queue, src/thread_pool.cpp:84-196)."""
    import threading

    from nvimagecodec_tpu.core.thread_pool import PriorityThreadPool

    pool = PriorityThreadPool(max_workers=1)
    order = []
    gate = threading.Event()
    pool.submit(gate.wait)  # hold the single worker so the queue builds up
    futs = [
        pool.submit(order.append, ("low", i), priority=0) for i in range(2)
    ]
    futs += [
        pool.submit(order.append, ("high", i), priority=10) for i in range(2)
    ]
    gate.set()
    for f in futs:
        f.result(timeout=5)
    assert order == [("high", 0), ("high", 1), ("low", 0), ("low", 1)]
    pool.shutdown()


def test_priority_thread_pool_affinity_parse():
    from nvimagecodec_tpu.core.thread_pool import _parse_cpuset

    assert _parse_cpuset("0-3,8") == [0, 1, 2, 3, 8]
    assert _parse_cpuset("2") == [2]
    assert _parse_cpuset("junk") is None


def test_debug_messenger_fanout_and_filtering():
    """User callbacks receive only messages matching their severity×category
    masks (reference: nvimgcodecDebugMessengerDesc,
    include/nvimgcodec.h:717-793)."""
    import nvimagecodec_tpu as nic
    from nvimagecodec_tpu.core import logger as L

    got_all, got_err = [], []
    h1 = nic.register_debug_messenger(
        lambda sev, cat, data: got_all.append((sev, cat, data.message)),
        severities=int(nic.DebugMessageSeverity.ALL),
    )
    h2 = nic.register_debug_messenger(
        lambda sev, cat, data: got_err.append(data.message),
        severities=int(nic.DebugMessageSeverity.ERROR),
        categories=int(nic.DebugMessageCategory.PERFORMANCE),
    )
    try:
        L.emit(L.DebugMessageSeverity.WARNING, L.DebugMessageCategory.PLUGIN, "w1")
        L.emit(L.DebugMessageSeverity.ERROR, L.DebugMessageCategory.PERFORMANCE, "e1")
        L.emit(L.DebugMessageSeverity.ERROR, L.DebugMessageCategory.GENERAL, "e2")
    finally:
        assert nic.unregister_debug_messenger(h1)
        assert nic.unregister_debug_messenger(h2)
    assert [m for _, _, m in got_all] == ["w1", "e1", "e2"]
    assert got_err == ["e1"]  # ERROR×PERFORMANCE only
    assert not nic.unregister_debug_messenger(h2)  # double-free is a no-op


def test_debug_messenger_fires_on_runtime_fallback():
    """The scheduler reports per-sample runtime fallback through the
    messenger chain (reference: decoder_worker.cpp:158-199)."""
    import oracle
    from util import make_photo

    import nvimagecodec_tpu as nic

    class FlakyDecoder:
        plugin_id = "flaky_test_decoder"
        codec_name = "jpeg"
        backend_kind = nic.BackendKind.HYBRID_CPU_TPU
        priority = -1000  # outrank everything

        def set_options(self, opts):
            pass

        def can_decode(self, data, infos, params):
            return [ProcessingStatus.SUCCESS] * len(data)

        def decode_batch(self, data, infos, params):
            from nvimagecodec_tpu.core.interfaces import DecodeResult

            return [DecodeResult(ProcessingStatus.FAIL, error="flaky")] * len(data)

    reg = nic.CodecRegistry()
    import nvimagecodec_tpu.core.plugin_framework as pf

    pf.register_builtin_modules(reg)
    reg.codec("jpeg").register_decoder(FlakyDecoder())

    msgs = []
    h = nic.register_debug_messenger(
        lambda sev, cat, data: msgs.append((int(cat), data.codec_id)),
        severities=int(nic.DebugMessageSeverity.ALL),
    )
    try:
        img = make_photo(16, 16, seed=3)
        out = nic.Decoder(registry=reg).decode(oracle.jpeg_encode(img, 90, "420"))
        assert out is not None  # fallback decoded it
    finally:
        nic.unregister_debug_messenger(h)
    assert any(
        cat & int(nic.DebugMessageCategory.PLUGIN) and cid == "flaky_test_decoder"
        for cat, cid in msgs
    )


def test_host_pool_policy_knobs():
    """Allocator-policy plumbing (reference analog: custom pinned-allocator
    hooks, include/nvimgcodec.h:232-302): pool size / per-key cap via the
    plugin options string, custom allocator via configure_host_pool."""
    import numpy as np

    import nvimagecodec_tpu as nic
    from nvimagecodec_tpu.codecs.jpeg.batch import _POOL

    import oracle

    old = (_POOL._max, _POOL.per_key_cap, _POOL._alloc)
    try:
        dec = nic.Decoder(
            options="tpu_jpeg_hybrid_decoder:host_pool_mb=64 "
                    "tpu_jpeg_hybrid_decoder:host_pool_per_key_cap=2")
        # options apply when the plugin instance is created (first decode)
        rng = np.random.default_rng(0)
        dec.decode(oracle.jpeg_encode(
            (rng.random((16, 16, 3)) * 255).astype(np.uint8), 90, "420"))
        assert _POOL._max == 64 << 20 and _POOL.per_key_cap == 2

        calls = []

        def alloc(shape, dtype):
            calls.append(shape)
            return np.empty(shape, dtype)

        nic.configure_host_pool(max_mb=128, per_key_cap=3, alloc=alloc)
        assert _POOL._max == 128 << 20 and _POOL.per_key_cap == 3
        a = _POOL.acquire(("k", 1), (16,), np.uint8)
        assert calls == [(16,)] and a.shape == (16,)
        _POOL.release(("k", 1), a)
        b = _POOL.acquire(("k", 1), (16,), np.uint8)
        assert calls == [(16,)]  # recycled, not re-allocated
        _POOL.release(("k", 1), b)
    finally:
        _POOL._max, _POOL.per_key_cap, _POOL._alloc = old
