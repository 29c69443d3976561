"""Restart-interval-parallel JPEG Huffman decode on the TPU.

The reference's hybrid decoder keeps entropy decode on the host CPU
(extensions/nvjpeg/cuda_decoder.cpp:425-427 nvjpegDecodeJpegHost); its HW
engine moves it into silicon. Here the TPU itself decodes: the host only
splits the scan at restart markers (one native pass), ships the raw
destuffed bits (~8 KB/segment — 6-40x less wire than coefficient planes),
and a Pallas kernel runs one restart segment per VECTOR LANE:

- each lane owns a branchless bit reader: a 64-bit window in two uint32
  registers plus a 6-deep word FIFO, refilled by a "conveyor" that
  broadcasts one row of the [W, S] word matrix per iteration to the lanes
  whose next-word index matches (min-indexed, so no lane misses its row);
- Huffman decoding is a 16-step canonical compare chain (per-length
  maxcode/valptr/mincode baked as constants per bucket, luma/chroma picked
  by a scalar select) followed by one vectorized compare-sum through the
  values[] table;
- the grid iterates block supersteps: every lane decodes block j of ITS
  segment, so the component, tables and output index are static per step;
  an inner while_loop runs until every active lane hits its EOB. Writes go
  to a (64, S) register file via an iota mask — zigzag order, which the
  pixel stage folds into the IDCT matrix for free;
- per-lane error flags surface malformed segments; the host re-decodes
  those samples on the CPU path (the scheduler's usual runtime fallback).

All per-lane state lives in VMEM scratch which persists across grid steps.
Requires: baseline sequential, one interleaved scan, 8-bit, restart
interval set, h/v factors <= 2, <= 2 table classes — everything else routes
to the host entropy stage.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

_FIFO = 6  # per-lane buffered words beyond cur/nxt


_TABLES_CACHE: dict = {}


def _build_tables(frame):
    """Per table class: (maxcode[17], base[17], values[nvals]) with
    base[l] = valptr[l] - mincode[l] so sym_idx = code + base[len].
    Content-cached: corpora typically share Huffman tables across frames,
    and this runs per sample on the routing path."""
    fp = tuple(
        (tc, tid, bytes(t.bits), bytes(t.values))
        for tc, tabs in enumerate((frame.dc_huff, frame.ac_huff))
        for tid, t in sorted(tabs.items())
    )
    hit = _TABLES_CACHE.get(fp)
    if hit is not None:
        return hit
    classes = []
    for tc in (0, 1):  # 0 = DC, 1 = AC
        per_id = {}
        tabs = frame.dc_huff if tc == 0 else frame.ac_huff
        for tid, t in tabs.items():
            code = 0
            k = 0
            maxcode = [-1] * 17
            base = [0] * 17
            for l in range(1, 17):
                n = t.bits[l - 1]
                base[l] = k - code
                code += n
                k += n
                maxcode[l] = code - 1 if n else -1
                code <<= 1
            per_id[tid] = (tuple(maxcode), tuple(base),
                           tuple(int(v) for v in t.values))
        classes.append(per_id)
    if len(_TABLES_CACHE) > 4096:
        _TABLES_CACHE.clear()
    _TABLES_CACHE[fp] = classes
    return classes  # [dc_tables, ac_tables]


def entropy_kernel_spec(frame, R: int = 0) -> Tuple:
    """Static bucket description: (R, bpm, comp_map, table ids, tables).
    `R` = MCUs per segment; 0 means use the frame's restart interval (DRI
    streams) — for streams without restart markers the caller picks R from
    the host index scan's split stride. Raises ValueError when the stream
    shape is outside kernel support."""
    if frame.is_progressive or frame.is_lossless or frame.precision != 8:
        raise ValueError("device entropy: baseline 8-bit only")
    if R <= 0:
        R = frame.restart_interval
    if R <= 0:
        raise ValueError("device entropy: needs a segment stride")
    if (len(frame.scans) != 1
            or len(frame.scans[0].comp_indices) != len(frame.components)):
        raise ValueError("device entropy: one interleaved scan only")
    if len(frame.components) == 1:
        c = frame.components[0]
        if c.h != 1 or c.v != 1:
            # T.81: single-component scans are non-interleaved (sampling
            # factors don't group blocks into MCUs)
            raise ValueError("device entropy: 1-comp scans need h=v=1")
    comp_map = []
    for ci, c in enumerate(frame.components):
        if c.h > 4 or c.v > 4:
            raise ValueError("device entropy: h/v factors <= 4 (T.81 B.2.2)")
        comp_map.extend([ci] * (c.h * c.v))
    scan = frame.scans[0]
    dc_tabs, ac_tabs = _build_tables(frame)
    tables = tuple(
        (dc_tabs[scan.dc_tables[ci]], ac_tabs[scan.ac_tables[ci]])
        for ci in range(len(frame.components))
    )
    mcus_x = -(-frame.width // (8 * frame.hmax))
    mcus_y = -(-frame.height // (8 * frame.vmax))
    return (R, tuple(comp_map), tables, mcus_x * mcus_y)


@functools.lru_cache(maxsize=32)
def _build_kernel(R: int, bpm: int, comp_map: tuple, tables_key: tuple,
                  W: int, S: int, interpret: bool):
    """pallas_call for one bucket geometry. Inputs: words [W, S] uint32,
    seg_mcus [1, S] int32. Outputs: coefficients [R*bpm, 64, S] int16
    (zigzag order) + err [1, S] int32."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tables = tables_key  # ((dc(maxc,base,vals), ac(maxc,base,vals)), ...)
    NBLK = R * bpm
    ncomp = len(tables)

    # Huffman values[] tables ride in as [nv, ncomp] inputs (sym_idx indexes
    # the sublane axis; the component picks the lane column) — maxcode/base
    # stay baked as scalar constants in the compare chain.
    def _vals_mat(tc):
        nv = max(len(tables[c][tc][2]) for c in range(ncomp))
        m = np.zeros((nv, ncomp), np.int32)
        for c in range(ncomp):
            v = tables[c][tc][2]
            m[: len(v), c] = v
        return m

    dc_vals_np, ac_vals_np = _vals_mat(0), _vals_mat(1)

    def kernel(words_ref, side_ref, dcv_ref, acv_ref, out_ref, err_ref,
               cur_ref, nxt_ref, p_ref, wfill_ref, fifo_ref, fcnt_ref,
               pred_ref, errs_ref):
        # side rows: 0 = MCUs per segment, 1 = start bit within words[0]
        # (0 for byte-aligned restart segments), 2..5 = initial DC
        # predictor per component (0 after a restart marker; the running
        # value at the split point for index-scanned segments)
        j = pl.program_id(0)
        u32 = jnp.uint32
        i32 = jnp.int32

        @pl.when(j == 0)
        def _init():
            cur_ref[:] = words_ref[0, :][None, :]
            nxt_ref[:] = words_ref[1, :][None, :]
            p_ref[:] = side_ref[1:2, :]
            wfill_ref[:] = jnp.full((1, S), 2, i32)
            fifo_ref[:] = jnp.zeros((_FIFO, S), u32)
            fcnt_ref[:] = jnp.zeros((1, S), i32)
            pred_ref[:] = side_ref[2:6, :]
            errs_ref[:] = jnp.zeros((1, S), i32)

        mcu_in_seg = j // bpm
        b_in_mcu = j % bpm
        active0 = (side_ref[0, :][None, :] > mcu_in_seg)

        def _bcast(cond, rows):
            """(1, S) bool -> (rows, S) bool. Mosaic can't relayout an i1
            vector with a replicated non-singleton dim; go through i32."""
            return jnp.broadcast_to(cond.astype(i32), (rows, S)) != 0

        # ---- conveyor: broadcast the LOWEST word index any live lane with
        # FIFO space still wants (demand-driven min, never skips a row, no
        # persistent pointer that a stalled lane could wedge) --------------
        def conveyor_step(state):
            cur, nxt, p, wfill, fifo, fcnt = state
            space = active0 & (fcnt < _FIFO) & (wfill < W)
            r = jnp.min(jnp.where(space, wfill, W))
            row = words_ref[pl.ds(jnp.minimum(r, W - 1), 1), :]
            want = space & (wfill == r)
            # push into per-lane FIFO at position fcnt
            slot = jax.lax.broadcasted_iota(i32, (_FIFO, S), 0)
            push = _bcast(want, _FIFO) & (slot == fcnt)
            fifo = jnp.where(push, row, fifo)
            fcnt = fcnt + want.astype(i32)
            wfill = wfill + want.astype(i32)
            return cur, nxt, p, wfill, fifo, fcnt

        # ---- branchless bit ops ----------------------------------------
        def funnel(cur, nxt, p):
            pu = p.astype(u32)
            hi = cur << pu
            lo = (nxt >> (u32(31) - pu)) >> u32(1)
            return hi | lo

        def consume(state, nbits, mask):
            """Advance mask'd lanes by nbits (vector; nbits <= 16)."""
            cur, nxt, p, wfill, fifo, fcnt = state
            p2 = p + jnp.where(mask, nbits, 0)
            need = p2 >= 32
            cur = jnp.where(need, nxt, cur)
            nxt = jnp.where(need, fifo[0:1, :], nxt)
            shifted = jnp.concatenate(
                [fifo[1:, :], jnp.zeros((1, S), u32)], axis=0)
            fifo = jnp.where(_bcast(need, _FIFO), shifted, fifo)
            fcnt = jnp.maximum(fcnt - need.astype(i32), 0)
            p = p2 - 32 * need.astype(i32)
            return (cur, nxt, p, wfill, fifo, fcnt)

        def ready(state):
            _, _, _, wfill, _, fcnt = state
            return (fcnt >= 1) | (wfill >= W)

        # ---- canonical Huffman decode (len, sym_idx) --------------------
        def decode_code(state, tc, comp_sel):
            """Returns (length, values-index) for the active table. The
            table constants are selected per-component by comp_sel (traced
            scalar), unrolled over the <=4 components."""
            cur, nxt, p, _, _, _ = state
            f = funnel(cur, nxt, p)
            peek16 = (f >> u32(16)).astype(i32)
            ln = jnp.zeros((1, S), i32)
            idx = jnp.zeros((1, S), i32)
            found = jnp.zeros((1, S), jnp.bool_)
            for l in range(1, 17):
                code_l = peek16 >> (16 - l)
                # per-component constant select (scalar tree)
                mc = _sel_const(comp_sel, [tables[c][tc][0][l]
                                           for c in range(ncomp)])
                ba = _sel_const(comp_sel, [tables[c][tc][1][l]
                                           for c in range(ncomp)])
                ok = (code_l <= mc) & (mc >= 0) & ~found
                ln = jnp.where(ok, l, ln)
                idx = jnp.where(ok, code_l + ba, idx)
                found = found | ok
            return ln, idx, found

        def _sel_const(sel, consts):
            v = jnp.asarray(consts[0], i32)
            for c in range(1, len(consts)):
                v = jnp.where(sel == c, jnp.asarray(consts[c], i32), v)
            return v

        def lookup_values(idx, tc, comp_sel):
            vref = dcv_ref if tc == 0 else acv_ref
            nv = vref.shape[0]
            tab = vref[:, 0:1]
            for c in range(1, ncomp):
                tab = jnp.where(comp_sel == c, vref[:, c:c + 1], tab)
            rows = jax.lax.broadcasted_iota(i32, (nv, S), 0)
            eq = rows == idx  # idx (1,S) broadcasts
            return jnp.sum(jnp.where(eq, tab, 0), axis=0, keepdims=True)

        def extend(bits, t):
            # T.81 F.2.2.1 EXTEND
            half = jnp.left_shift(jnp.ones((1, S), i32),
                                  jnp.maximum(t - 1, 0))
            full = jnp.left_shift(jnp.ones((1, S), i32), t)
            neg = bits < half
            v = jnp.where(neg, bits - full + 1, bits)
            return jnp.where(t == 0, 0, v)

        def get_bits(state, t, mask):
            cur, nxt, p, *_ = state
            f = funnel(cur, nxt, p)
            tu = jnp.where(t > 0, t, 1).astype(u32)
            bits = (f >> (u32(32) - tu)).astype(i32)
            bits = jnp.where(t > 0, bits, 0)
            return bits, consume(state, t, mask)

        comp_sel = jnp.asarray(comp_map[0], i32)
        # b_in_mcu is traced; build comp selection from the static map
        for b in range(1, bpm):
            comp_sel = jnp.where(b_in_mcu == b,
                                 jnp.asarray(comp_map[b], i32), comp_sel)

        state = (cur_ref[:], nxt_ref[:], p_ref[:], wfill_ref[:],
                 fifo_ref[:], fcnt_ref[:])
        errs = errs_ref[:]
        regs = jnp.zeros((64, S), i32)

        # ---- DC coefficient (one symbol, stall-looped) -------------------
        pred0 = pred_ref[:]

        # pend rides the while carries as i32 — Mosaic can't legalize i1
        # vector loop carries (scf.yield legalization failure)
        def dc_cond(carry):
            state, _, _, _, pend_i = carry
            return jnp.any(pend_i != 0)

        def dc_body(carry):
            state, regs, errs, pred, pend_i = carry
            pend = pend_i != 0
            state = conveyor_step(state)
            go = pend & ready(state)
            ln, idx, found = decode_code(state, 0, comp_sel)
            t = lookup_values(idx, 0, comp_sel)
            bad = go & (~found | (t > 15))
            errs = errs + bad.astype(i32)
            ok = go & ~bad
            state = consume(state, jnp.where(ok, ln, 0), ok)
            bits, state = get_bits(state, jnp.where(ok, t, 0), ok)
            diff = extend(bits, t)
            # predictors: one row per component
            rowsel = jax.lax.broadcasted_iota(i32, (4, S), 0) == comp_sel
            pred = jnp.where(rowsel & _bcast(ok, 4), pred + diff, pred)
            dcval = jnp.sum(jnp.where(rowsel, pred, 0), axis=0,
                            keepdims=True)
            k0 = jax.lax.broadcasted_iota(i32, (64, S), 0) == 0
            regs = jnp.where(k0 & _bcast(ok, 64),
                             jnp.broadcast_to(dcval, (64, S)), regs)
            pend = pend & ~ok & ~bad
            return state, regs, errs, pred, pend.astype(i32)

        state, regs, errs, pred0, _ = jax.lax.while_loop(
            dc_cond, dc_body,
            (state, regs, errs, pred0, active0.astype(i32)))
        pred_ref[:] = pred0

        # ---- AC coefficients: run-length loop until EOB ------------------
        def ac_cond(carry):
            state, _, _, _, pend_i = carry
            return jnp.any(pend_i != 0)

        def ac_body(carry):
            state, regs, errs, k, pend_i = carry
            pend = pend_i != 0
            state = conveyor_step(state)
            go = pend & ready(state)
            ln, idx, found = decode_code(state, 1, comp_sel)
            sym = lookup_values(idx, 1, comp_sel)
            bad = go & ~found
            run = sym >> 4
            ssz = sym & 15
            state = consume(state, jnp.where(go & ~bad, ln, 0), go & ~bad)
            is_eob = (ssz == 0) & (run != 15)
            is_zrl = (ssz == 0) & (run == 15)
            do_val = go & ~bad & ~is_eob & ~is_zrl
            kk = jnp.where(do_val, k + run, k)
            overflow = do_val & (kk > 63)
            bad = bad | overflow
            bits, state = get_bits(
                state, jnp.where(do_val & ~overflow, ssz, 0),
                do_val & ~overflow)
            val = extend(bits, ssz)
            kw = jnp.clip(kk, 0, 63)
            wsel = (jax.lax.broadcasted_iota(i32, (64, S), 0)
                    == jnp.broadcast_to(kw, (64, S)))
            regs = jnp.where(wsel & _bcast(do_val & ~overflow, 64),
                             jnp.broadcast_to(val, (64, S)), regs)
            k = jnp.where(go & ~bad,
                          jnp.where(is_zrl, k + 16,
                                    jnp.where(is_eob, k, kk + 1)), k)
            errs = errs + bad.astype(i32)
            done_now = (go & (bad | is_eob)) | (go & (k > 63))
            pend = pend & ~done_now
            return state, regs, errs, k, pend.astype(i32)

        k_init = jnp.where(active0, 1, 64)
        state, regs, errs, _, _ = jax.lax.while_loop(
            ac_cond, ac_body,
            (state, regs, errs, k_init, active0.astype(i32)))

        # ---- persist state, emit block -----------------------------------
        cur, nxt, p, wfill, fifo, fcnt = state
        cur_ref[:] = cur
        nxt_ref[:] = nxt
        p_ref[:] = p
        wfill_ref[:] = wfill
        fifo_ref[:] = fifo
        fcnt_ref[:] = fcnt
        errs_ref[:] = errs
        out_ref[:] = regs.astype(jnp.int16)[None]
        err_ref[:] = (errs > 0).astype(i32)

        # restart boundary: predictors reset between segments is implicit —
        # each lane IS one segment, so predictors never cross a restart

    import jax

    grid = (NBLK,)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, S), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, S), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(dc_vals_np.shape, lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ac_vals_np.shape, lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 64, S), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NBLK, 64, S), jnp.int16),
            jax.ShapeDtypeStruct((1, S), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, S), jnp.uint32),   # cur
            pltpu.VMEM((1, S), jnp.uint32),   # nxt
            pltpu.VMEM((1, S), jnp.int32),    # p
            pltpu.VMEM((1, S), jnp.int32),    # wfill
            pltpu.VMEM((_FIFO, S), jnp.uint32),  # fifo
            pltpu.VMEM((1, S), jnp.int32),    # fcnt
            pltpu.VMEM((4, S), jnp.int32),    # pred
            pltpu.VMEM((1, S), jnp.int32),    # errs
        ],
        interpret=interpret,
    )

    def fn(words, side):
        return call(words, side, dc_vals_np, ac_vals_np)

    return fn


def make_side(seg_mcus: np.ndarray, start_bits=None,
              dc0=None) -> np.ndarray:
    """Assemble the kernel's [6, S] int32 sideband from per-lane MCU
    counts, optional start bits, and optional [4, S] DC predictor seeds
    (both zero for restart-marker segments)."""
    S = seg_mcus.shape[-1]
    side = np.zeros((6, S), np.int32)
    side[0] = seg_mcus.reshape(-1)
    if start_bits is not None:
        side[1] = start_bits.reshape(-1)
    if dc0 is not None:
        side[2:6] = dc0
    return side


def decode_segments_device(frame, words: np.ndarray, seg_mcus: np.ndarray,
                           interpret: bool = False, R: int = 0,
                           start_bits=None, dc0=None):
    """words: [W, S] uint32 column-packed destuffed segments; seg_mcus:
    [S] int32 MCUs per segment (0 = padding lane). Returns (coefs [NBLK,
    64, S] int16 zigzag, err [S] int32) as device arrays."""
    R, comp_map, tables, _total = entropy_kernel_spec(frame, R)
    bpm = len(comp_map)
    W, S = words.shape
    fn = _build_kernel(R, bpm, comp_map, tables, W, S, interpret)
    out, err = fn(words, make_side(seg_mcus, start_bits, dc0))
    return out, err[0]


# ===================================================================
# Progressive-scan device kernels: streams with restart markers decode
# scan-by-scan on device — the DC scan, each AC band scan and the
# successive-approximation refinement scans (Ah > 0) are restart-parallel
# exactly like the baseline kernel's segments (the reference decodes full
# progressive on GPU, extensions/nvjpeg/cuda_decoder.cpp:75-76). The
# conveyor/Huffman machinery mirrors the baseline kernel above.

def prog_scan_specs(frame):
    """Validate a progressive frame for the device path; returns per-scan
    (is_dc, comp_map_or_comp, R_units) metadata. Raises ValueError when
    any scan is outside kernel support."""
    if not frame.is_progressive or frame.precision != 8:
        raise ValueError("prog device entropy: 8-bit progressive only")
    specs = []
    for s in frame.scans:
        if s.restart_interval <= 0:
            raise ValueError("prog device entropy: needs restart markers")
        if s.ss == 0:
            if s.se != 0:
                raise ValueError("prog device entropy: bad DC scan")
            if len(s.comp_indices) != len(frame.components):
                raise ValueError("prog device entropy: partial DC scan")
            for c in frame.components:
                if c.h > 4 or c.v > 4:
                    raise ValueError("prog device entropy: h/v <= 4")
        else:
            if len(s.comp_indices) != 1:
                raise ValueError("prog device entropy: AC scan not single")
        specs.append(s)
    return specs


@functools.lru_cache(maxsize=32)
def _build_prog_kernel(kind: str, R: int, bpm: int, comp_map: tuple,
                       tables_key: tuple, ss: int, se: int, al: int,
                       W: int, S: int, interpret: bool):
    """kind 'dc': interleaved DC scan (bpm blocks/MCU, per-comp DC tables;
    out [R*bpm, 1, S]). kind 'ac': single-component band scan (R blocks
    per segment, one AC table; out [R, 64, S] with rows ss..se filled).
    kind 'dcref': DC successive-approximation refinement (one raw bit per
    block; out [R*bpm, 1, S] of bit<<al, caller ORs into the DC row).
    kind 'acref': AC refinement (T.81 G.1.2.3) — takes the CURRENT block
    coefficients [R, 64, S] as an extra input and returns the refined
    ones (correction bits on nonzero history, newly-significant
    insertions, EOB runs that still consume correction bits)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tables = tables_key
    ncomp = len(tables)
    NBLK = R * bpm if kind in ("dc", "dcref") else R
    OUTK = 1 if kind in ("dc", "dcref") else 64

    def _vals_mat():
        nv = max(len(t[2]) for t in tables)
        m = np.zeros((nv, ncomp), np.int32)
        for c in range(ncomp):
            v = tables[c][2]
            m[: len(v), c] = v
        return m

    vals_np = _vals_mat()

    def kernel(words_ref, side_ref, v_ref, *rest):
        if kind == "acref":
            (in_ref, out_ref, err_ref, cur_ref, nxt_ref, p_ref, wfill_ref,
             fifo_ref, fcnt_ref, pred_ref, errs_ref, eob_ref) = rest
        else:
            in_ref = None
            (out_ref, err_ref, cur_ref, nxt_ref, p_ref, wfill_ref,
             fifo_ref, fcnt_ref, pred_ref, errs_ref, eob_ref) = rest
        j = pl.program_id(0)
        u32 = jnp.uint32
        i32 = jnp.int32

        @pl.when(j == 0)
        def _init():
            cur_ref[:] = words_ref[0, :][None, :]
            nxt_ref[:] = words_ref[1, :][None, :]
            p_ref[:] = side_ref[1:2, :]
            wfill_ref[:] = jnp.full((1, S), 2, i32)
            fifo_ref[:] = jnp.zeros((_FIFO, S), u32)
            fcnt_ref[:] = jnp.zeros((1, S), i32)
            pred_ref[:] = side_ref[2:6, :]
            errs_ref[:] = jnp.zeros((1, S), i32)
            eob_ref[:] = jnp.zeros((1, S), i32)

        unit = j // bpm if kind in ("dc", "dcref") else j
        b_in_mcu = j % bpm if kind in ("dc", "dcref") else 0
        active0 = (side_ref[0, :][None, :] > unit)

        def _bcast(cond, rows):
            return jnp.broadcast_to(cond.astype(i32), (rows, S)) != 0

        def conveyor_step(state):
            cur, nxt, p, wfill, fifo, fcnt = state
            space = active0 & (fcnt < _FIFO) & (wfill < W)
            r = jnp.min(jnp.where(space, wfill, W))
            row = words_ref[pl.ds(jnp.minimum(r, W - 1), 1), :]
            want = space & (wfill == r)
            slot = jax.lax.broadcasted_iota(i32, (_FIFO, S), 0)
            push = _bcast(want, _FIFO) & (slot == fcnt)
            fifo = jnp.where(push, row, fifo)
            fcnt = fcnt + want.astype(i32)
            wfill = wfill + want.astype(i32)
            return cur, nxt, p, wfill, fifo, fcnt

        def funnel(cur, nxt, p):
            pu = p.astype(u32)
            hi = cur << pu
            lo = (nxt >> (u32(31) - pu)) >> u32(1)
            return hi | lo

        def consume(state, nbits, mask):
            cur, nxt, p, wfill, fifo, fcnt = state
            p2 = p + jnp.where(mask, nbits, 0)
            need = p2 >= 32
            cur = jnp.where(need, nxt, cur)
            nxt = jnp.where(need, fifo[0:1, :], nxt)
            shifted = jnp.concatenate(
                [fifo[1:, :], jnp.zeros((1, S), u32)], axis=0)
            fifo = jnp.where(_bcast(need, _FIFO), shifted, fifo)
            fcnt = jnp.maximum(fcnt - need.astype(i32), 0)
            p = p2 - 32 * need.astype(i32)
            return (cur, nxt, p, wfill, fifo, fcnt)

        def ready(state):
            _, _, _, wfill, _, fcnt = state
            return (fcnt >= 1) | (wfill >= W)

        def decode_code(state, comp_sel):
            cur, nxt, p, _, _, _ = state
            f = funnel(cur, nxt, p)
            peek16 = (f >> u32(16)).astype(i32)
            ln = jnp.zeros((1, S), i32)
            idx = jnp.zeros((1, S), i32)
            found = jnp.zeros((1, S), jnp.bool_)
            for l in range(1, 17):
                code_l = peek16 >> (16 - l)
                mc = _sel(comp_sel, [tables[c][0][l] for c in range(ncomp)])
                ba = _sel(comp_sel, [tables[c][1][l] for c in range(ncomp)])
                ok = (code_l <= mc) & (mc >= 0) & ~found
                ln = jnp.where(ok, l, ln)
                idx = jnp.where(ok, code_l + ba, idx)
                found = found | ok
            return ln, idx, found

        def _sel(sel, consts):
            v = jnp.asarray(consts[0], i32)
            for c in range(1, len(consts)):
                v = jnp.where(sel == c, jnp.asarray(consts[c], i32), v)
            return v

        def lookup_values(idx, comp_sel):
            nv = v_ref.shape[0]
            tab = v_ref[:, 0:1]
            for c in range(1, ncomp):
                tab = jnp.where(comp_sel == c, v_ref[:, c:c + 1], tab)
            rows = jax.lax.broadcasted_iota(i32, (nv, S), 0)
            eq = rows == idx
            return jnp.sum(jnp.where(eq, tab, 0), axis=0, keepdims=True)

        def extend(bits, t):
            half = jnp.left_shift(jnp.ones((1, S), i32),
                                  jnp.maximum(t - 1, 0))
            full = jnp.left_shift(jnp.ones((1, S), i32), t)
            neg = bits < half
            v = jnp.where(neg, bits - full + 1, bits)
            return jnp.where(t == 0, 0, v)

        def get_bits(state, t, mask):
            cur, nxt, p, *_ = state
            f = funnel(cur, nxt, p)
            tu = jnp.where(t > 0, t, 1).astype(u32)
            bits = (f >> (u32(32) - tu)).astype(i32)
            bits = jnp.where(t > 0, bits, 0)
            return bits, consume(state, t, mask)

        if kind == "dc":
            comp_sel = jnp.asarray(comp_map[0], i32)
            for b in range(1, bpm):
                comp_sel = jnp.where(b_in_mcu == b,
                                     jnp.asarray(comp_map[b], i32), comp_sel)
        else:
            comp_sel = jnp.zeros((), i32)

        state = (cur_ref[:], nxt_ref[:], p_ref[:], wfill_ref[:],
                 fifo_ref[:], fcnt_ref[:])
        errs = errs_ref[:]
        regs = jnp.zeros((OUTK, S), i32)

        if kind == "dc":
            pred0 = pred_ref[:]

            def dc_cond(carry):
                state, _, _, _, pend_i = carry
                return jnp.any(pend_i != 0)

            def dc_body(carry):
                state, regs, errs, pred, pend_i = carry
                pend = pend_i != 0
                state = conveyor_step(state)
                go = pend & ready(state)
                ln, idx, found = decode_code(state, comp_sel)
                t = lookup_values(idx, comp_sel)
                bad = go & (~found | (t > 15))
                errs = errs + bad.astype(i32)
                ok = go & ~bad
                state = consume(state, jnp.where(ok, ln, 0), ok)
                bits, state = get_bits(state, jnp.where(ok, t, 0), ok)
                diff = extend(bits, t)
                rowsel = (jax.lax.broadcasted_iota(i32, (4, S), 0)
                          == comp_sel)
                pred = jnp.where(rowsel & _bcast(ok, 4), pred + diff, pred)
                dcval = jnp.sum(jnp.where(rowsel, pred, 0), axis=0,
                                keepdims=True)
                regs = jnp.where(ok, dcval << al, regs)
                pend = pend & ~ok & ~bad
                return state, regs, errs, pred, pend.astype(i32)

            state, regs, errs, pred0, _ = jax.lax.while_loop(
                dc_cond, dc_body,
                (state, regs, errs, pred0, active0.astype(i32)))
            pred_ref[:] = pred0
        elif kind == "dcref":
            # one raw bit per block: DC refinement at plane al (caller ORs
            # bit<<al into the DC coefficient — two's complement OR is the
            # T.81 G.1.2.1 reconstruction)
            def dr_cond(carry):
                _, _, _, pend_i = carry
                return jnp.any(pend_i != 0)

            def dr_body(carry):
                state, regs, errs, pend_i = carry
                pend = pend_i != 0
                state = conveyor_step(state)
                go = pend & ready(state)
                bits, state = get_bits(state, jnp.where(go, 1, 0), go)
                regs = jnp.where(go, bits << al, regs)
                pend = pend & ~go
                return state, regs, errs, pend.astype(i32)

            state, regs, errs, _ = jax.lax.while_loop(
                dr_cond, dr_body, (state, regs, errs, active0.astype(i32)))
        elif kind == "acref":
            # T.81 G.1.2.3 AC refinement: per-position stepping (one
            # position or one symbol decode per iteration per lane) over
            # the CURRENT coefficients, mirroring entropy_py._ac_refine
            p1 = 1 << al
            regs = in_ref[0].astype(i32)   # [64, S] zigzag coefficients
            eob0 = eob_ref[:]
            ineob0 = active0 & (eob0 > 0)
            k0 = jnp.where(active0, ss, 65)
            z1 = jnp.zeros((1, S), i32)

            def ar_cond(carry):
                return jnp.any(carry[-1] != 0)

            def ar_body(carry):
                (state, regs, errs, k, rrem, sval, ineob_i, eob,
                 pend_i) = carry
                pend = pend_i != 0
                ineob = ineob_i != 0
                state = conveyor_step(state)
                go = pend & ready(state)
                # --- symbol decode lanes (no run, no pending value)
                need = go & ~ineob & (rrem == 0) & (sval == 0)
                ln, idx, found = decode_code(state, comp_sel)
                sym = lookup_values(idx, comp_sel)
                bad = need & ~found
                okn = need & ~bad
                state = consume(state, jnp.where(okn, ln, 0), okn)
                run = sym >> 4
                ssz = sym & 15
                is_eobn = okn & (ssz == 0) & (run != 15)
                is_zrl = okn & (ssz == 0) & (run == 15)
                is_coded = okn & (ssz != 0)
                ebits, state = get_bits(
                    state, jnp.where(is_eobn, run, 0), is_eobn)
                neweob = (jnp.left_shift(jnp.ones((1, S), i32), run)
                          + ebits)
                eob = jnp.where(is_eobn, neweob, eob)
                ineob = ineob | is_eobn
                sbit, state = get_bits(
                    state, jnp.where(is_coded, 1, 0), is_coded)
                sval = jnp.where(is_coded,
                                 jnp.where(sbit != 0, p1, -p1), sval)
                rrem = jnp.where(is_coded, run,
                                 jnp.where(is_zrl, 16, rrem))
                errs = errs + bad.astype(i32)
                # --- position step for all other ready lanes
                step = go & ~need & (k <= se)
                kw = jnp.clip(k, 0, 63)
                rowsel = (jax.lax.broadcasted_iota(i32, (64, S), 0)
                          == jnp.broadcast_to(kw, (64, S)))
                curc = jnp.sum(jnp.where(rowsel, regs, 0), axis=0,
                               keepdims=True)
                nonzero = curc != 0
                corr = step & nonzero
                cbit, state = get_bits(state, jnp.where(corr, 1, 0), corr)
                do_corr = corr & (cbit != 0) & ((curc & p1) == 0)
                delta = jnp.where(curc >= 0, p1, -p1)
                newc = curc + jnp.where(do_corr, delta, 0)
                zstep = step & ~nonzero
                dec_run = zstep & ~ineob & (rrem > 0)
                place = zstep & ~ineob & (rrem == 0) & (sval != 0)
                rrem = rrem - dec_run.astype(i32)
                newc = jnp.where(place, sval, newc)
                regs = jnp.where(rowsel & _bcast(step, 64),
                                 jnp.broadcast_to(newc, (64, S)), regs)
                sval = jnp.where(place, 0, sval)
                k = k + step.astype(i32)
                # a pending value with no zero-history slot left: error
                over = (k > se) & (sval != 0) & step
                errs = errs + over.astype(i32)
                sval = jnp.where(over, 0, sval)
                pend = pend & ~bad & ~(k > se)
                return (state, regs, errs, k, rrem, sval,
                        ineob.astype(i32), eob, pend.astype(i32))

            (state, regs, errs, _k, _r, _sv, ineobf, eobf, _p) = (
                jax.lax.while_loop(
                    ar_cond, ar_body,
                    (state, regs, errs, k0, z1, z1,
                     ineob0.astype(i32), eob0, active0.astype(i32))))
            # every block inside an EOB run consumes one unit of it
            eob_ref[:] = jnp.where(active0 & (ineobf != 0), eobf - 1, eobf)
        else:
            eob = eob_ref[:]
            skip = active0 & (eob > 0)
            eob = jnp.where(skip, eob - 1, eob)
            pend0 = active0 & ~skip

            def ac_cond(carry):
                state, _, _, _, _, pend_i = carry
                return jnp.any(pend_i != 0)

            def ac_body(carry):
                state, regs, errs, k, eob, pend_i = carry
                pend = pend_i != 0
                state = conveyor_step(state)
                go = pend & ready(state)
                ln, idx, found = decode_code(state, comp_sel)
                sym = lookup_values(idx, comp_sel)
                bad = go & ~found
                run = sym >> 4
                ssz = sym & 15
                state = consume(state, jnp.where(go & ~bad, ln, 0),
                                go & ~bad)
                is_eobn = (ssz == 0) & (run != 15)
                is_zrl = (ssz == 0) & (run == 15)
                # EOBn: read `run` extra bits -> eobrun for FOLLOWING blocks
                ebits, state = get_bits(
                    state, jnp.where(go & ~bad & is_eobn, run, 0),
                    go & ~bad & is_eobn)
                neweob = (jnp.left_shift(jnp.ones((1, S), i32), run) - 1
                          + ebits)
                eob = jnp.where(go & ~bad & is_eobn, neweob, eob)
                do_val = go & ~bad & ~is_eobn & ~is_zrl
                kk = jnp.where(do_val, k + run, k)
                overflow = do_val & (kk > se)
                bad = bad | overflow
                bits, state = get_bits(
                    state, jnp.where(do_val & ~overflow, ssz, 0),
                    do_val & ~overflow)
                val = extend(bits, ssz) << al
                kw = jnp.clip(kk, 0, 63)
                wsel = (jax.lax.broadcasted_iota(i32, (64, S), 0)
                        == jnp.broadcast_to(kw, (64, S)))
                regs = jnp.where(wsel & _bcast(do_val & ~overflow, 64),
                                 jnp.broadcast_to(val, (64, S)), regs)
                k = jnp.where(go & ~bad,
                              jnp.where(is_zrl, k + 16,
                                        jnp.where(is_eobn, k, kk + 1)), k)
                errs = errs + bad.astype(i32)
                done_now = (go & (bad | is_eobn)) | (go & (k > se))
                pend = pend & ~done_now
                return state, regs, errs, k, eob, pend.astype(i32)

            k_init = jnp.where(pend0, ss, 64)
            state, regs, errs, _, eob, _ = jax.lax.while_loop(
                ac_cond, ac_body,
                (state, regs, errs, k_init, eob, pend0.astype(i32)))
            eob_ref[:] = eob

        cur, nxt, p, wfill, fifo, fcnt = state
        cur_ref[:] = cur
        nxt_ref[:] = nxt
        p_ref[:] = p
        wfill_ref[:] = wfill
        fifo_ref[:] = fifo
        fcnt_ref[:] = fcnt
        errs_ref[:] = errs
        out_ref[:] = regs.astype(jnp.int16)[None]
        err_ref[:] = (errs > 0).astype(jnp.int32)

    import jax

    in_specs = [
        pl.BlockSpec((W, S), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((6, S), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(vals_np.shape, lambda j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if kind == "acref":
        in_specs.append(pl.BlockSpec((1, 64, S), lambda j: (j, 0, 0),
                                     memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        kernel,
        grid=(NBLK,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, OUTK, S), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NBLK, OUTK, S), jnp.int16),
            jax.ShapeDtypeStruct((1, S), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, S), jnp.uint32),
            pltpu.VMEM((1, S), jnp.uint32),
            pltpu.VMEM((1, S), jnp.int32),
            pltpu.VMEM((1, S), jnp.int32),
            pltpu.VMEM((_FIFO, S), jnp.uint32),
            pltpu.VMEM((1, S), jnp.int32),
            pltpu.VMEM((4, S), jnp.int32),
            pltpu.VMEM((1, S), jnp.int32),
            pltpu.VMEM((1, S), jnp.int32),   # eobrun (AC scans)
        ],
        interpret=interpret,
    )

    if kind == "acref":
        def fn(words, side, band_in):
            return call(words, side, vals_np, band_in)
    else:
        def fn(words, side):
            return call(words, side, vals_np)

    return fn


def decode_prog_scan_device(frame, scan, words: np.ndarray,
                            seg_units: np.ndarray, interpret: bool = False,
                            band_in=None):
    """Decode one progressive scan's restart segments on device.
    DC scan: returns ([R*bpm, 1, S] int16 DC values, err). AC scan:
    returns ([R, 64, S] int16 band coefficients (zigzag rows ss..se), err).
    DC refinement (Ah>0): [R*bpm, 1, S] of bit<<al, caller ORs into DC.
    AC refinement: band_in = CURRENT [R, 64, S] int16 zigzag coefficients;
    returns the refined ones. seg_units: MCUs (DC) or blocks (AC) per
    lane."""
    W, S = words.shape
    R = scan.restart_interval

    def _one(t):
        # canonical (maxcode, base, values) from the SCAN's table snapshot
        # (progressive streams may redefine tables between scans)
        code = 0
        k = 0
        maxcode = [-1] * 17
        base = [0] * 17
        for l in range(1, 17):
            n = t.bits[l - 1]
            base[l] = k - code
            code += n
            k += n
            maxcode[l] = code - 1 if n else -1
            code <<= 1
        return (tuple(maxcode), tuple(base),
                tuple(int(v) for v in t.values))

    if scan.ss == 0:
        comp_map = []
        for ci, c in enumerate(frame.components):
            comp_map.extend([ci] * (c.h * c.v))
        if scan.ah == 0:
            tables = tuple(_one(scan.dc_huff[scan.dc_tables[ci]])
                           for ci in range(len(frame.components)))
            fn = _build_prog_kernel("dc", R, len(comp_map),
                                    tuple(comp_map), tables, 0, 0,
                                    scan.al, W, S, interpret)
        else:
            # DC refinement reads no Huffman tables; pass a placeholder
            tables = ((tuple([-1] * 17), tuple([0] * 17), (0,)),)
            fn = _build_prog_kernel("dcref", R, len(comp_map),
                                    tuple(comp_map), tables, 0, 0,
                                    scan.al, W, S, interpret)
        out, err = fn(words, make_side(seg_units))
        return out, err[0]
    tables = (_one(scan.ac_huff[scan.ac_tables[0]]),)
    if scan.ah == 0:
        fn = _build_prog_kernel("ac", R, 1, (0,), tables, scan.ss, scan.se,
                                scan.al, W, S, interpret)
        out, err = fn(words, make_side(seg_units))
    else:
        fn = _build_prog_kernel("acref", R, 1, (0,), tables, scan.ss,
                                scan.se, scan.al, W, S, interpret)
        out, err = fn(words, make_side(seg_units),
                      np.ascontiguousarray(band_in, np.int16))
    return out, err[0]
