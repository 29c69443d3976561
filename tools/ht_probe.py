"""HTJ2K (ITU-T T.814) probe harness: prototype HT cleanup encoder validated
against the system openjpeg 2.5 HT decoder (the only locally available T.814
implementation, used strictly as a black-box conformance oracle).

Workflow: craft single-tile, levels=0 codestreams whose only entropy content
is one HT cleanup segment per code-block; decode through opj_bridge; compare
coefficients. Used to pin down the exact normative bit-level procedures
(MEL/VLC/UVLC/MagSgn interleave, context formation, EMB semantics) before
committing the C++ implementation in native/j2k_ht.cpp.
"""
from __future__ import annotations

import struct
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from nvimagecodec_tpu.codecs.jpeg2000.codestream import (
    EOC, QCD, SIZ, SOC, SOD, SOT, CodingParams, SizInfo,
    build_resolutions, write_cod, write_qcd, write_siz, _seg,
)
from nvimagecodec_tpu.codecs.jpeg2000.t2 import PacketEncoder, plan_layers
from nvimagecodec_tpu.native import opj_bridge

CAP = 0xFF50

# ---------------------------------------------------------------- tables
# Normative CxtVLC tables (T.814 Annex C). Extracted as spec constants from
# the system openjpeg 2.5 .rodata (they are ITU-T standard tables, the same
# constants any T.814 implementation must embed).
_SO_PATH = "/usr/lib/x86_64-linux-gnu/libopenjp2.so.2.5.0"
_RO_OFF = 0x4F000
_TBL0_OFF = 0x1900  # vlc_tbl0 (initial line pair) — confirmed by probe
_TBL1_OFF = 0x1100  # vlc_tbl1 (non-initial line pairs)


def load_tables():
    data = open(_SO_PATH, "rb").read()
    ro = data[_RO_OFF:]
    t0 = struct.unpack_from("<1024H", ro, _TBL0_OFF)
    t1 = struct.unpack_from("<1024H", ro, _TBL1_OFF)
    return t0, t1


VLC_TBL0, VLC_TBL1 = load_tables()


def table_rows(tbl, c_q):
    """Distinct (cwd, len, rho, u_off, e_1, e_k) rows of one context."""
    rows = []
    seen = set()
    for cw in range(128):
        e = tbl[(c_q << 7) | cw]
        L = e & 7
        if cw != (cw & ((1 << L) - 1)) or e in seen:
            continue
        seen.add(e)
        rows.append(dict(cwd=cw, len=L, rho=(e >> 4) & 0xF,
                         u_off=(e >> 3) & 1, e_1=(e >> 8) & 0xF,
                         e_k=(e >> 12) & 0xF))
    return rows


# ---------------------------------------------------------------- MEL coder
MEL_E = [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 4, 5]


class MelEncoder:
    def __init__(self):
        self.k = 0
        self.run = 0
        self.bits = []  # raw bits before byte packing

    def encode(self, event: int) -> None:
        if event == 0:
            self.run += 1
            if self.run == (1 << MEL_E[self.k]):
                self.bits.append(1)
                self.k = min(self.k + 1, 12)
                self.run = 0
        else:
            self.bits.append(0)
            for i in range(MEL_E[self.k] - 1, -1, -1):
                self.bits.append((self.run >> i) & 1)
            self.k = max(self.k - 1, 0)
            self.run = 0

    def flush(self) -> bytes:
        if self.run > 0:
            self.bits.append(1)  # claim a (possibly overlong) full run
        out = bytearray()
        acc, n, cap = 0, 0, 8
        for b in self.bits:
            acc = (acc << 1) | b
            n += 1
            if n == cap:
                out.append(acc if cap == 8 else acc)  # MSB of 7-bit byte = 0
                cap = 7 if out[-1] == 0xFF else 8
                acc, n = 0, 0
        if n:
            # pad with 1s (claims full runs; decoder never consumes them)
            while n < cap:
                acc = (acc << 1) | 1
                n += 1
            # avoid emitting 0xFF as the final byte (stuffing-safety)
            if cap == 8 and acc == 0xFF:
                acc = 0xFE
            out.append(acc)
        return bytes(out)


# ---------------------------------------------------------------- VLC packer
def pack_vlc(bits) -> bytes:
    """Pack VLC bits (decode order) into bytes for the backward reader.

    Returns bytes in FILE order: [..., b2, b1, nibble_byte]; the nibble
    byte's low nibble is left 0 for the caller to merge Scup's low 4 bits.
    Decoder model (T.814 / opj rev_init+rev_read): first 4 bits come from
    the high nibble of D[Lcup-2] LSB-first, but only 3 if those three bits
    are all 1 (4th is a stuff bit, must be 0); later bytes (descending
    addresses) contribute 8 bits LSB-first, or 7 (MSB stuff, must be 0)
    when the previously-read byte was > 0x8F and the 7 low bits are all 1.
    """
    bits = list(bits)
    pos = 0
    out = []  # bytes in decode order

    # nibble byte
    nib = 0
    take = min(3, len(bits) - pos)
    for i in range(take):
        nib |= bits[pos + i] << i
    pos += take
    if (nib & 7) == 7:
        pass  # stuff: 4th nibble bit stays 0
    elif pos < len(bits):
        nib |= bits[pos] << 3
        pos += 1
    out.append(nib << 4)

    prev = out[0]
    while pos < len(bits):
        b = 0
        take = min(7, len(bits) - pos)
        for i in range(take):
            b |= bits[pos + i] << i
        if prev > 0x8F and (b & 0x7F) == 0x7F:
            pos += 7  # MSB is stuff (0)
        else:
            pos += take
            if pos < len(bits):
                b |= bits[pos] << 7
                pos += 1
        out.append(b)
        prev = b
    return bytes(reversed(out))


# ---------------------------------------------------------------- UVLC
def uvlc_bits(u: int):
    """Prefix+suffix bit lists (decode order, LSB-consumed-first) for one
    unsigned residual u >= 1."""
    if u == 1:
        return [1], []
    if u == 2:
        return [0, 1], []
    if u <= 4:
        return [0, 0, 1], [u - 3]
    assert u <= 36, u
    v = u - 5
    return [0, 0, 0], [(v >> i) & 1 for i in range(5)]


# ---------------------------------------------------- ctx/kappa hypotheses
def ctx2_default(sW, sNW, sN0, sN1, sNE):
    """Non-initial line-pair context (T.814 eqn 2) — CONFIRMED by probing:
    bit0 = sigma(NW)|sigma(N0), bit1 = sigma(W right column),
    bit2 = sigma(N1)|sigma(NE). North samples are the bottom row of the
    quad-row above; the west quad's left column is irrelevant; the row
    y = 2j-2 (top row of the quad-row above) is irrelevant."""
    return (sNW | sN0) | (sW << 1) | ((sN1 | sNE) << 2)


def kappa2_default(rho, e_nw, e_n0, e_n1, e_ne):
    """kappa_q for non-initial rows — CONFIRMED by probing:
    kappa = max(1, gamma * (Emax - 1)), gamma = (quad has >1 significant
    sample), Emax = max exponent of the four north neighbors NW,N0,N1,NE
    (exponent E = bitlen(2*mu-1), 0 if insignificant)."""
    gamma = 1 if (rho & (rho - 1)) else 0
    emax = max(e_nw, e_n0, e_n1, e_ne)
    return max(1, gamma * (emax - 1))


CTX2 = ctx2_default
KAPPA2 = kappa2_default
CTX_OVERRIDE = {}  # (qy, qx) -> forced context (experiment hook)


def encode_cleanup_general(block: np.ndarray, dump=False) -> bytes:
    """HT cleanup for arbitrary-height blocks: initial line pair via eqn 1
    (validated), non-initial line pairs via the pluggable CTX2/KAPPA2."""
    H, W = block.shape
    QW = -(-W // 2)
    QH = -(-H // 2)
    mel = MelEncoder()
    vlc = []
    mag = []

    def sample(x, y):
        if x >= W or y >= H or x < 0 or y < 0:
            return 0
        return int(block[y, x])

    sig = np.zeros((H + 2, W + 4), np.int8)   # pad: 1 left/top, 3 right
    Earr = np.zeros((H + 2, W + 4), np.int32)

    rows_cache = {}
    def rows_for(tbl_id, c_q):
        key = (tbl_id, c_q)
        if key not in rows_cache:
            rows_cache[key] = table_rows(
                VLC_TBL0 if tbl_id == 0 else VLC_TBL1, c_q)
        return rows_cache[key]

    for qy in range(QH):
        initial = qy == 0
        tbl_id = 0 if initial else 1
        c_q = 0
        pending = []
        y0 = 2 * qy
        for qx in range(QW):
            x0 = 2 * qx
            vals = [sample(x0, y0), sample(x0, y0 + 1),
                    sample(x0 + 1, y0), sample(x0 + 1, y0 + 1)]
            rho = 0
            Es = [0] * 4
            ws = [0] * 4
            for n, v in enumerate(vals):
                if v != 0:
                    rho |= 1 << n
                    mu = abs(v)
                    s = 1 if v < 0 else 0
                    ws[n] = 2 * (mu - 1) + s
                    Es[n] = (2 * mu - 1).bit_length()
            emax = max(Es)
            if not initial:
                sW = 1 if (sig[y0 + 1, x0] or sig[y0 + 2, x0]) else 0
                sNW = int(sig[y0, x0])
                sN0 = int(sig[y0, x0 + 1])
                sN1 = int(sig[y0, x0 + 2])
                sNE = int(sig[y0, x0 + 3])
                if (qy, qx) in CTX_OVERRIDE:
                    c_q = CTX_OVERRIDE[(qy, qx)]
                else:
                    c_q = CTX2(sW, sNW, sN0, sN1, sNE)
                kappa = KAPPA2(rho, int(Earr[y0, x0]), int(Earr[y0, x0 + 1]),
                               int(Earr[y0, x0 + 2]), int(Earr[y0, x0 + 3]))
            else:
                kappa = 1
            if c_q == 0:
                mel.encode(1 if rho else 0)
            row = None
            if rho or c_q != 0:
                U = max(kappa, emax)
                u_off = 1 if emax > kappa else 0
                cand = [r for r in rows_for(tbl_id, c_q)
                        if r["rho"] == rho and r["u_off"] == u_off]
                for r in sorted(cand, key=lambda r: -bin(r["e_k"]).count("1")):
                    ok = True
                    for n in range(4):
                        if (r["e_k"] >> n) & 1:
                            msb = (ws[n] >> (U - 1)) & 1 if Es[n] == U else 0
                            if Es[n] > U or msb != ((r["e_1"] >> n) & 1):
                                ok = False
                                break
                    if ok:
                        row = r
                        break
                assert row is not None, (tbl_id, c_q, rho, u_off, Es, U)
                for i in range(row["len"]):
                    vlc.append((row["cwd"] >> i) & 1)
            else:
                U, u_off = kappa, 0
            pending.append(dict(rho=rho, u_off=u_off, U=U, ws=ws, Es=Es,
                                e_k=row["e_k"] if row else 0, kappa=kappa))
            # record sigma / E for the next quad-row's context
            for n in range(4):
                dx, dy = n >> 1, n & 1
                sig[y0 + 1 + dy, x0 + 1 + dx] = 1 if (rho >> n) & 1 else 0
                Earr[y0 + 1 + dy, x0 + 1 + dx] = Es[n]
            # next-quad context (initial rows only; eqn 1)
            if initial:
                c_q = (1 if (rho & 3) else 0) | (((rho >> 2) & 1) << 1) \
                    | (((rho >> 3) & 1) << 2)
            if len(pending) == 2 or qx == QW - 1:
                q0 = pending[0]
                q1 = pending[1] if len(pending) > 1 else dict(
                    rho=0, u_off=0, U=1, ws=[0] * 4, e_k=0, kappa=1)
                mode = q0["u_off"] | (q1["u_off"] << 1)
                u0 = q0["U"] - q0["kappa"]
                u1 = q1["U"] - q1["kappa"]
                if initial:
                    if mode == 3:
                        both_gt2 = u0 > 2 and u1 > 2
                        mel.encode(1 if both_gt2 else 0)
                        if both_gt2:
                            p0, s0 = uvlc_bits(u0 - 2)
                            p1, s1 = uvlc_bits(u1 - 2)
                            vlc += p0 + p1 + s0 + s1
                        else:
                            p0, s0 = uvlc_bits(u0)
                            if u0 > 2:
                                assert 1 <= u1 <= 2
                                vlc += p0 + [u1 - 1] + s0
                            else:
                                p1, s1 = uvlc_bits(u1)
                                vlc += p0 + s0 + p1 + s1
                    elif mode == 1:
                        p, s = uvlc_bits(u0)
                        vlc += p + s
                    elif mode == 2:
                        p, s = uvlc_bits(u1)
                        vlc += p + s
                else:
                    if mode == 3:
                        p0, s0 = uvlc_bits(u0)
                        p1, s1 = uvlc_bits(u1)
                        vlc += p0 + p1 + s0 + s1
                    elif mode == 1:
                        p, s = uvlc_bits(u0)
                        vlc += p + s
                    elif mode == 2:
                        p, s = uvlc_bits(u1)
                        vlc += p + s
                for q in (q0, q1):
                    for n in range(4):
                        if (q["rho"] >> n) & 1:
                            m_n = q["U"] - ((q["e_k"] >> n) & 1)
                            w = q["ws"][n]
                            for i in range(m_n):
                                mag.append((w >> i) & 1)
                pending = []

    ms = bytearray()
    acc, n, cap = 0, 0, 8
    for b in mag:
        acc |= b << n
        n += 1
        if n == cap:
            ms.append(acc)
            cap = 7 if acc == 0xFF else 8
            acc, n = 0, 0
    if n:
        ms.append(acc)
    mel_bytes = mel.flush()
    vlc_bytes = pack_vlc(vlc)
    scup = len(mel_bytes) + len(vlc_bytes) + 1
    assert 2 <= scup <= 4079, scup
    suffix = bytearray(mel_bytes + vlc_bytes)
    suffix[-1] |= scup & 0xF
    suffix.append(scup >> 4)
    seg = bytes(ms) + bytes(suffix)
    if dump:
        print("magsgn:", bytes(ms).hex(), "mel:", mel_bytes.hex(),
              "vlc:", vlc_bytes.hex(), "scup:", scup)
    return seg


# ------------------------------------------------------- codestream builder
def build_ht_stream(coefs: np.ndarray, depth=8, cap=True, rsiz=0x4000,
                    magb=None, zero_bps=None, dump=False) -> bytes:
    """Single-component, single-tile, levels=0 codestream whose LL band is
    `coefs` (already DC-shift-removed signed values)."""
    H, W = coefs.shape
    siz = SizInfo(width=W, height=H, x0=0, y0=0, tile_w=W, tile_h=H,
                  tx0=0, ty0=0, ncomp=1, depth=[depth], signed=[False],
                  sub_x=[1], sub_y=[1])
    cp = CodingParams(levels=0, reversible=True, mct=False,
                      cblk_w=max(4, 1 << (W - 1).bit_length()),
                      cblk_h=max(4, 1 << (H - 1).bit_length()),
                      prog_order=0, num_layers=1, cblk_style=0x40,
                      qcd_style=0, guard_bits=2)
    # clamp cblk to 64 max, and >= 4
    cp.cblk_w = min(64, cp.cblk_w)
    cp.cblk_h = min(64, cp.cblk_h)
    maxmag = int(np.abs(coefs).max())
    nbps = maxmag.bit_length()
    eps = max(depth, nbps - cp.guard_bits + 1)
    cp.band_q = [(eps, 0)]
    mb = eps + cp.guard_bits - 1
    if zero_bps is None:
        # T.814: for an HT block the "zero bitplanes" field P encodes the
        # cleanup-pass bitplane: p = (Mb - P) - 1. Cleanup-only lossless
        # (p = 0) therefore signals P = Mb - 1 (probed vs openjpeg).
        zero_bps = mb - 1

    seg = encode_cleanup_general(coefs, dump=dump)
    resolutions = {0: build_resolutions(0, 0, W, H, 0)}
    penc = PacketEncoder(cp, resolutions, 1)
    penc.set_plan(0, 0, 0, 0, [plan_layers(seg, 1, zero_bps, 1)])
    packet = penc.write_packet(0, 0, 0, 0)

    out = bytearray(struct.pack(">H", SOC))
    p = struct.pack(
        ">HIIIIIIIIH", rsiz, siz.width, siz.height, 0, 0,
        siz.tile_w, siz.tile_h, 0, 0, 1,
    ) + struct.pack(">BBB", depth - 1, 1, 1)
    out += _seg(SIZ, p)
    if cap:
        pcap = 1 << 17  # bit 15 (from MSB) => Part 15
        if magb is None:
            magb = max(0, mb - 8)
        ccap15 = magb & 0x1F
        out += _seg(CAP, struct.pack(">IH", pcap, ccap15))
    out += write_cod(cp)
    out += write_qcd(cp)
    lsot = 10
    psot = 2 + lsot + 2 + len(packet)
    out += struct.pack(">HHHIBB", SOT, lsot, 0, psot, 0, 1)
    out += struct.pack(">H", SOD)
    out += packet
    out += struct.pack(">H", EOC)
    return bytes(out)


def probe(coefs, depth=8, dump=False, **kw):
    data = build_ht_stream(np.asarray(coefs, np.int32), depth=depth,
                           dump=dump, **kw)
    img, prec, sg = opj_bridge.decode(data)
    dec = img[:, :, 0].astype(np.int64) - (1 << (depth - 1))
    return dec


if __name__ == "__main__":
    rng = np.random.default_rng(7)
    nfail = ntest = 0
    for i in range(60):
        H = int(rng.integers(1, 33))
        W = int(rng.integers(1, 65))
        density = rng.choice([0.1, 0.5, 0.9])
        mag = int(rng.choice([1, 2, 50, 16000]))
        c = (rng.integers(-mag, mag + 1, (H, W)) *
             (rng.random((H, W)) < density)).astype(np.int32)
        ntest += 1
        try:
            dec = probe(c, depth=16)
            if not np.array_equal(dec, c):
                nfail += 1
                print(f"MISMATCH {H}x{W} d={density} mag={mag}")
        except Exception as e:
            nfail += 1
            print(f"ERROR {H}x{W} d={density} mag={mag}: {e}")
    print(f"cleanup battery vs openjpeg: {ntest - nfail}/{ntest} pass")


# ================================================================ Z=3 passes
def encode_ht_full(block: np.ndarray, p: int = 1):
    """Encode (cleanup at plane p) + SigProp(p-1) + MagRef(p-1) for signed
    int32 coefficients. Returns (cup_seg, ref_seg). Samples whose magnitude
    is entirely below plane p and that have no significant neighbor are NOT
    representable (inherent to T.814 SigProp reach) — caller beware."""
    H, W = block.shape
    mag = np.abs(block)
    sgn = (block < 0).astype(np.int32)
    mu_p = mag >> p  # cleanup-plane magnitudes
    cup = encode_cleanup_general(np.where(mu_p > 0, mu_p, 0) *
                                 np.where(sgn > 0, -1, 1))
    # significance state after cleanup
    sig = (mu_p > 0).astype(np.int8)
    spp_bits = []
    mrp_bits = []
    newsig = np.zeros_like(sig)

    def neigh_sig(x, y, state):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                xx, yy = x + dx, y + dy
                if 0 <= xx < W and 0 <= yy < H and state[yy, xx]:
                    return True
        return False

    state = sig.copy()  # progressive within the pass (confirmed by probe)
    for y0 in range(0, H, 4):
        for x0 in range(0, W, 4):
            grp_new = []  # sign bits grouped per 4 stripe-columns
            for x in range(x0, min(x0 + 4, W)):
                for y in range(y0, min(y0 + 4, H)):
                    if state[y, x]:
                        continue
                    if not neigh_sig(x, y, state):
                        continue
                    # significant at p-1 via SPP <=> mag >> (p-1) == 1
                    b = 1 if (mag[y, x] >> (p - 1)) == 1 else 0
                    spp_bits.append(b)
                    if b:
                        grp_new.append((x, y))
                        newsig[y, x] = 1
                        state[y, x] = 1
            for (xx, yy) in grp_new:
                spp_bits.append(int(sgn[yy, xx]))
    # MagRef: cleanup-significant samples, stripe-column order
    for y0 in range(0, H, 4):
        for x in range(W):
            for y in range(y0, min(y0 + 4, H)):
                if sig[y, x]:
                    mrp_bits.append(int((mag[y, x] >> (p - 1)) & 1))

    # SPP bytes: forward, LSB-first, 0xFF stuffing
    spp = bytearray()
    acc, n, cap = 0, 0, 8
    for b in spp_bits:
        acc |= b << n
        n += 1
        if n == cap:
            spp.append(acc)
            cap = 7 if acc == 0xFF else 8
            acc, n = 0, 0
    if n:
        spp.append(acc)
    # MRP bytes: backward reader from segment end; emission order == decode
    # order, then reverse bytes into the file. Stuff rule mirrors the VLC
    # backward reader: after a byte > 0x8F, a byte whose low 7 bits are all
    # ones carries only those 7 bits (MSB is a stuff 0).
    mrp = bytearray()
    pos = 0
    prev = 0xFF  # the backward MRP reader starts with unstuff armed (probed)
    while pos < len(mrp_bits):
        b = 0
        take = min(7, len(mrp_bits) - pos)
        for i in range(take):
            b |= mrp_bits[pos + i] << i
        if prev > 0x8F and (b & 0x7F) == 0x7F:
            pos += 7  # MSB is stuff (0)
        else:
            pos += take
            if pos < len(mrp_bits):
                b |= mrp_bits[pos] << 7
                pos += 1
        mrp.append(b)
        prev = b
    ref = bytes(spp) + bytes(reversed(mrp))
    return cup, ref


def build_ht_stream_z(coefs: np.ndarray, p: int = 1, depth: int = 8,
                      npasses: int = 3) -> bytes:
    """Codestream with Z passes: cleanup at plane p (+SPP/MRP at p-1)."""
    import struct as _s
    coefs = np.asarray(coefs, np.int32)
    H, W = coefs.shape
    siz = SizInfo(width=W, height=H, x0=0, y0=0, tile_w=W, tile_h=H,
                  tx0=0, ty0=0, ncomp=1, depth=[depth], signed=[False],
                  sub_x=[1], sub_y=[1])
    cp = CodingParams(levels=0, reversible=True, mct=False,
                      cblk_w=min(64, max(4, 1 << (W - 1).bit_length())),
                      cblk_h=min(64, max(4, 1 << (H - 1).bit_length())),
                      prog_order=0, num_layers=1, cblk_style=0x40,
                      qcd_style=0, guard_bits=2)
    maxmag = int(np.abs(coefs).max())
    nbps = maxmag.bit_length()
    eps = max(depth, nbps - cp.guard_bits + 1)
    cp.band_q = [(eps, 0)]
    mb = eps + cp.guard_bits - 1
    # B = p + 1 (cleanup at plane p, refinement reaches p-1 ... plane 0)
    zero_bps = mb - (p + 1)
    cup, ref = encode_ht_full(coefs, p=p)
    if npasses == 1:
        segs = [(cup, 1)]
    else:
        segs = [(cup, 1), (ref, npasses - 1)]

    # hand-written packet header: single block, single band, maximal precinct
    from nvimagecodec_tpu.codecs.jpeg2000.codestream import HeaderBitWriter
    bw = HeaderBitWriter()
    bw.put_bit(1)           # packet non-empty
    bw.put_bit(1)           # inclusion tag tree 1x1: value 0 < 1
    for _ in range(zero_bps):
        bw.put_bit(0)       # zbp tag tree: zero_bps 0s then 1
    bw.put_bit(1)
    # npasses
    if npasses == 1:
        bw.put_bit(0)
    elif npasses == 2:
        bw.put_bits(0b10, 2)
    else:
        bw.put_bits(0b11, 2)
        bw.put_bits(npasses - 3, 2)
    lblock = 3
    nbits_needed = []
    import math as _m
    for seg, np_ in segs:
        nbits_needed.append(max(1, len(seg)).bit_length() -
                            int(_m.floor(_m.log2(np_))))
    while lblock < max(nbits_needed):
        bw.put_bit(1)
        lblock += 1
    bw.put_bit(0)
    for seg, np_ in segs:
        bw.put_bits(len(seg), lblock + int(_m.floor(_m.log2(np_))))
    packet = bw.flush() + b"".join(s for s, _ in segs)

    out = bytearray(_s.pack(">H", SOC))
    pl = _s.pack(">HIIIIIIIIH", 0x4000, W, H, 0, 0, W, H, 0, 0, 1) + \
        _s.pack(">BBB", depth - 1, 1, 1)
    out += _seg(SIZ, pl)
    out += _seg(CAP, _s.pack(">IH", 1 << 17, max(0, mb - 8)))
    out += write_cod(cp)
    out += write_qcd(cp)
    lsot = 10
    psot = 2 + lsot + 2 + len(packet)
    out += _s.pack(">HHHIBB", SOT, lsot, 0, psot, 0, 1)
    out += _s.pack(">H", SOD)
    out += packet
    out += _s.pack(">H", EOC)
    return bytes(out)
