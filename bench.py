#!/usr/bin/env python
"""Headline benchmark: JPEG 4:2:0 ImageNet-size decode images/s/chip.

Metric per BASELINE.json. The reference publishes no numbers (BASELINE.md),
so vs_baseline is measured against libjpeg-turbo's single-threaded decode of
the same corpus on this host — the strongest locally measurable reference
decoder (the role OpenCV/libjpeg play as the reference's own CPU fallback).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

# persistent compile cache: the axon backend pays a large one-time remote
# warmup; cache what can be cached
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

N_IMAGES = 512
H, W = 375, 500  # ImageNet-ish
QUALITY = 85
BATCH = 256


def log(*a):
    print(*a, file=sys.stderr)


def main() -> None:
    import numpy as np

    from util import make_photo

    # --- corpus ------------------------------------------------------------
    try:
        import oracle

        base = [make_photo(H, W, seed=s) for s in range(8)]
        jpgs = [
            oracle.jpeg_encode(base[i % 8], QUALITY, "420") for i in range(N_IMAGES)
        ]
        have_oracle = True
    except Exception as e:  # no system libjpeg — encode with our own encoder
        log("oracle unavailable:", e)
        from nvimagecodec_tpu.codecs.jpeg.encode import encode_jpeg

        base = [make_photo(H, W, seed=s) for s in range(8)]
        jpgs = [encode_jpeg(base[i % 8]) for i in range(N_IMAGES)]
        have_oracle = False

    import jax
    import jax.numpy as jnp

    from nvimagecodec_tpu import Decoder

    dec = Decoder()

    def force(img):
        """Force device completion without fetching (outputs stay on device —
        the consumer is a TPU input pipeline; eager slice+sum ops cost ~40 ms
        each over the axon tunnel)."""
        a = img.array
        if isinstance(a, np.ndarray):
            return int(a[0, 0, 0])
        jax.block_until_ready(a)
        return 0

    # --- warmup (jit compile + axon backend warmup) -------------------------
    log("warmup...")
    t0 = time.perf_counter()
    out = dec.decode(jpgs[:BATCH])
    assert all(o is not None for o in out), "warmup decode failed"
    force(out[-1])
    log(f"warmup done in {time.perf_counter() - t0:.1f}s")

    # --- timed decode ------------------------------------------------------
    # depth-2 pipeline: host stage of batch N overlaps device compute of
    # batch N-1 (jax dispatch is async; force is completion-only). Two
    # passes, best reported: the shared device tunnel adds large run-to-run
    # interference that is not part of the codec's cost.
    from nvimagecodec_tpu import pipeline

    def one_pass():
        t0 = time.perf_counter()
        decoded = 0
        batches = (jpgs[i:i + BATCH] for i in range(0, N_IMAGES, BATCH))
        for outs in pipeline.decode_batches(batches, decoder=dec,
                                            drop_failed=False):
            for o in outs:
                assert o is not None
            decoded += len(outs)
        return decoded / (time.perf_counter() - t0)

    tpu_passes = [one_pass() for _ in range(3)]
    ips = max(tpu_passes)
    log(f"tpu decode: best of 3 passes -> {ips:.1f} img/s "
        f"(all: {[round(p, 1) for p in tpu_passes]})")

    # --- encode throughput + libjpeg-turbo 1-thread encode baseline --------
    encode_ips = encode_vs = None
    try:
        # host pipeline outright: the device-stage probe fetches D2H, which
        # can hang when the tunnel wedges (and the tunneled readback never
        # clears the break-even threshold anyway)
        os.environ.setdefault("TIC_ENCODE_DEVICE", "0")
        from nvimagecodec_tpu import Encoder
        from nvimagecodec_tpu.core.interfaces import EncodeParams

        enc = Encoder()
        eparams = EncodeParams(quality=85, chroma_subsampling="420")
        enc.encode(base, codec="jpeg", params=eparams)  # warm

        def enc_pass():
            t0 = time.perf_counter()
            outs = enc.encode(base * 8, codec="jpeg", params=eparams)
            n_ok = sum(o is not None for o in outs)
            assert n_ok == len(base) * 8
            return n_ok / (time.perf_counter() - t0)

        enc_passes = [enc_pass() for _ in range(3)]
        encode_ips = max(enc_passes)
        log(f"jpeg encode: best of 3 -> {encode_ips:.1f} img/s "
            f"(all: {[round(p, 1) for p in enc_passes]})")
        if have_oracle:
            def enc_base_pass():
                t0 = time.perf_counter()
                for img in base * 8:
                    oracle.jpeg_encode(img, 85, "420")
                return len(base) * 8 / (time.perf_counter() - t0)

            eb_passes = [enc_base_pass() for _ in range(3)]
            log(f"libjpeg-turbo 1-thread encode: best of 3 -> "
                f"{max(eb_passes):.1f} img/s "
                f"(all: {[round(p, 1) for p in eb_passes]})")
            encode_vs = encode_ips / max(eb_passes)
            log(f"encode vs baseline: {encode_vs:.3f}")
    except Exception as e:
        log("encode bench skipped:", e)

    # --- baseline: libjpeg-turbo single-thread -----------------------------
    # symmetric de-noising: best-of-3 on both sides, spreads in the JSON
    vs = None
    base_passes = []
    if have_oracle:
        import oracle

        def base_pass():
            t0 = time.perf_counter()
            for j in jpgs[:256]:
                oracle.jpeg_decode(j)
            return 256 / (time.perf_counter() - t0)

        base_passes = [base_pass() for _ in range(3)]
        base_ips = max(base_passes)
        log(f"libjpeg-turbo 1-thread: best of 3 -> {base_ips:.1f} img/s "
            f"(all: {[round(p, 1) for p in base_passes]})")
        vs = ips / base_ips

    print(
        json.dumps(
            {
                "metric": "jpeg420_decode_imagenet_size",
                "value": round(ips, 1),
                "unit": "images/s/chip",
                "vs_baseline": round(vs, 3) if vs else None,
                "passes": [round(p, 1) for p in tpu_passes],
                "baseline_passes": [round(p, 1) for p in base_passes],
                "encode_value": round(encode_ips, 1) if encode_ips else None,
                "encode_vs_baseline": round(encode_vs, 3) if encode_vs else None,
            }
        )
    )


    # --- informational sections (stderr only) run AFTER the headline JSON;
    # a watchdog hard-exits if a wedged device link hangs one of them (the
    # driver already has the JSON by then)
    sys.stdout.flush()
    import threading as _th

    _watchdog = _th.Timer(420.0, lambda: (log("watchdog: informational "
                                              "section hung; exiting"),
                                          os._exit(0)))
    _watchdog.daemon = True
    _watchdog.start()

    # --- informational: on-device entropy decode (stderr only) -------------
    # restart-interval corpus routes through the Pallas entropy kernel (the
    # host only splits segments); same pixels, different entropy engine
    try:
        from nvimagecodec_tpu.codecs.jpeg.headers import parse_jpeg_structure

        f0 = parse_jpeg_structure(jpgs[0])
        ri = -(-f0.width // (8 * f0.hmax))
        dri_jpgs = [
            oracle.jpeg_encode(base[i % 8], QUALITY, "420", restart_interval=ri)
            for i in range(N_IMAGES)
        ] if have_oracle else []
        if dri_jpgs:
            out = dec.decode(dri_jpgs[:BATCH])
            force(out[-1])

            def dri_pass():
                # same depth-2 pipeline as the main corpus: the deferred
                # DRI error validation of batch N overlaps batch N+1
                t0 = time.perf_counter()
                decoded = 0
                batches = (dri_jpgs[i:i + BATCH]
                           for i in range(0, N_IMAGES, BATCH))
                for outs in pipeline.decode_batches(batches, decoder=dec,
                                                    drop_failed=False):
                    decoded += len(outs)
                return decoded / (time.perf_counter() - t0)

            dri = max(dri_pass() for _ in range(3))
            os.environ["TIC_NO_DEVICE_ENTROPY"] = "1"
            try:
                dec.decode(dri_jpgs[:BATCH])
                dri_host = max(dri_pass() for _ in range(2))
            finally:
                os.environ.pop("TIC_NO_DEVICE_ENTROPY", None)
            log(f"device-entropy decode (DRI corpus): {dri:.1f} img/s "
                f"vs host route on the same corpus: {dri_host:.1f} img/s "
                f"(x{dri / max(dri_host, 1e-9):.2f})")
    except Exception as e:
        log("device-entropy bench skipped:", e)

    # --- informational: index-scan wire vs full host entropy ----------------
    # same (non-DRI) corpus decoded twice: with the device-entropy
    # index-scan route enabled vs forced host entropy — isolates what the
    # compact indexed wire is worth on this link
    try:
        def main_pass():
            t0 = time.perf_counter()
            decoded = 0
            batches = (jpgs[i:i + BATCH] for i in range(0, N_IMAGES, BATCH))
            for outs in pipeline.decode_batches(batches, decoder=dec,
                                                drop_failed=False):
                decoded += len(outs)
            return decoded / (time.perf_counter() - t0)

        # idx route FIRST: the host route's wide wire registers much larger
        # host buffers with the transport, which degrades transfer latency
        # for the rest of the process (ordering penalty measured ~2x)
        dec.decode(jpgs[:BATCH])
        idx_ips = max(main_pass() for _ in range(2))
        os.environ["TIC_NO_DEVICE_ENTROPY"] = "1"
        try:
            dec.decode(jpgs[:BATCH])  # warm the host-route jits
            host_ips = max(main_pass() for _ in range(2))
        finally:
            os.environ.pop("TIC_NO_DEVICE_ENTROPY", None)
        log(f"index-scan route: {idx_ips:.1f} img/s vs full host entropy: "
            f"{host_ips:.1f} img/s (wire win x{idx_ips / host_ips:.2f})")
    except Exception as e:
        log("index-scan isolation skipped:", e)

    # --- informational: JPEG2000 + HTJ2K decode vs single-thread openjpeg --
    # host-vs-host comparison (our native EBCOT/HT T1 over the thread pool
    # vs libopenjp2); the reference gets these codecs from nvjpeg2k
    try:
        import time as _time

        from nvimagecodec_tpu.codecs.jpeg2000.core import decode_j2k, encode_j2k
        from nvimagecodec_tpu.native import opj_bridge

        big = make_photo(1024, 1024, seed=3)
        for label, kw in (("j2k", {}), ("htj2k", {"ht": True})):
            stream = encode_j2k(big, reversible=True, levels=5,
                                stream_type="j2k", **kw)
            decode_j2k(stream)  # warm
            t0 = _time.perf_counter()
            n = 0
            while _time.perf_counter() - t0 < 3.0:
                decode_j2k(stream)
                n += 1
            ours_ips = n / (_time.perf_counter() - t0)
            opj_bridge.decode(stream)  # warm + validates it decodes there
            t0 = _time.perf_counter()
            n = 0
            while _time.perf_counter() - t0 < 3.0:
                opj_bridge.decode(stream)
                n += 1
            opj_ips = n / (_time.perf_counter() - t0)
            log(f"{label} decode 1024x1024 rev: ours {ours_ips:.2f} img/s "
                f"vs openjpeg-1t {opj_ips:.2f} img/s "
                f"(x{ours_ips / opj_ips:.2f})")
            t0 = _time.perf_counter()
            n = 0
            while _time.perf_counter() - t0 < 3.0:
                encode_j2k(big, reversible=True, levels=5,
                           stream_type="j2k", **kw)
                n += 1
            enc_ips = n / (_time.perf_counter() - t0)
            t0 = _time.perf_counter()
            n = 0
            while _time.perf_counter() - t0 < 3.0:
                opj_bridge.encode_lossless(big)
                n += 1
            openc_ips = n / (_time.perf_counter() - t0)
            log(f"{label} encode 1024x1024 rev: ours {enc_ips:.2f} img/s "
                f"vs openjpeg {openc_ips:.2f} img/s "
                f"(x{enc_ips / openc_ips:.2f})")
    except Exception as e:
        log("j2k bench skipped:", e)

    # --- scaling audit (virtual 8-device CPU mesh, stderr only) -------------
    try:
        import subprocess

        r = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "bench_scaling.py")],
            capture_output=True, text=True, timeout=240,
            env={k: v for k, v in os.environ.items()
                 if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
        )
        for line in (r.stderr + r.stdout).splitlines():
            log("scaling |", line)
    except Exception as e:
        log("scaling audit skipped:", e)

    _watchdog.cancel()

if __name__ == "__main__":
    main()
