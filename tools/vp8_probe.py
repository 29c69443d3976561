"""VP8 bitstream probe: handcraft minimal keyframe streams and decode them
with libwebp to pin down mode-coding semantics (trees, probabilities,
contexts) against the real decoder. Counterpart of tools/ht_probe.py for
the VP8 work in native/webp_vp8.cpp."""
import struct
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import oracle  # noqa: E402


# ------------------------------------------------------------ bool encoder
class BoolEnc:
    """RFC 6386 section 7.1 reference arithmetic encoder."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 0xFF:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def put(self, prob, bit):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8
        return self

    def literal(self, v, n):
        for i in range(n - 1, -1, -1):
            self.put(128, (v >> i) & 1)

    def flush(self):
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8
        return bytes(self.out)


def tree_put(be, tree, probs, leaf):
    """Encode `leaf` through an RFC tree (leaves are ~value)."""
    # find path by DFS
    def path(i):
        for b in (0, 1):
            t = tree[i + b]
            if t <= 0:
                if ~t == leaf:
                    return [(i >> 1, b)]
            else:
                sub = path(t)
                if sub is not None:
                    return [(i >> 1, b)] + sub
        return None

    p = path(0)
    assert p is not None, leaf
    for probidx, bit in p:
        be.put(probs[probidx], bit)


KF_YMODE_TREE = [~4, 2, 4, 6, ~0, ~1, ~2, ~3]
KF_YMODE_PROBS = [145, 156, 163, 128]
UV_TREE = [~0, 2, ~1, 4, ~2, ~3]
KF_UV_PROBS = [142, 114, 183]
BMODE_TREE = [~0, 2, ~1, 4, ~2, 6, 8, 12, ~3, 10, ~5, ~6, ~4, 14, ~7, 16,
              ~8, ~9]


def load_bmode_probs():
    data = open("/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5", "rb").read()
    t = data[0x5A6C0:0x5A6C0 + 900]
    # libwebp's table is indexed by ITS bmode enum (RD=4, VR=5, LD=6);
    # permute into RFC intra_bmode order (LD=4, RD=5, VR=6)
    pm = {0: 0, 1: 1, 2: 2, 3: 3, 4: 6, 5: 4, 6: 5, 7: 7, 8: 8, 9: 9}
    return [[list(t[(pm[a] * 10 + pm[l]) * 9:(pm[a] * 10 + pm[l]) * 9 + 9])
             for l in range(10)] for a in range(10)]


BMODE_PROBS = load_bmode_probs()


def build_stream(mb_w, mb_h, mbs, ctx_above_major=True):
    """mbs: list of dicts per MB in raster order:
       {ymode: 0..4, bmodes: [16] if ymode==4, uvmode: 0..3}
       All MBs are skipped (no tokens) -> pure prediction output."""
    be = BoolEnc()
    be.put(128, 0)  # color space
    be.put(128, 0)  # clamping
    be.put(128, 0)  # segmentation disabled
    be.put(128, 0)  # filter type
    be.literal(0, 6)  # filter level 0
    be.literal(0, 3)  # sharpness
    be.put(128, 0)  # lf delta disabled
    be.literal(0, 2)  # 1 token partition
    be.literal(40, 7)  # y_ac_qi
    for _ in range(5):
        be.put(128, 0)  # no quant deltas
    be.put(128, 0)  # refresh entropy
    # no coeff prob updates
    import struct as _s
    data = open("/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5", "rb").read()
    upd = data[0x5A2A0:0x5A2A0 + 1056]
    for p in upd:
        be.put(p, 0)
    be.put(128, 1)  # mb_no_coeff_skip enabled
    be.literal(255, 8)  # prob_skip = 255 (skip bit decodes cheaply as 1)

    above_modes = [[0] * 4 for _ in range(mb_w)]  # bottom row of above MBs
    for my in range(mb_h):
        left_modes = [0] * 4
        for mx in range(mb_w):
            mb = mbs[my * mb_w + mx]
            be.put(255, 1)  # skip = 1
            tree_put(be, KF_YMODE_TREE, KF_YMODE_PROBS, mb["ymode"])
            if mb["ymode"] == 4:
                bm = mb["bmodes"]
                for sy in range(4):
                    for sx in range(4):
                        am = (bm[(sy - 1) * 4 + sx] if sy > 0 else
                              above_modes[mx][sx] if my > 0 else 0)
                        lm = (bm[sy * 4 + sx - 1] if sx > 0 else
                              left_modes[sy] if mx > 0 else 0)
                        probs = (BMODE_PROBS[am][lm] if ctx_above_major
                                 else BMODE_PROBS[lm][am])
                        tree_put(be, BMODE_TREE, probs, bm[sy * 4 + sx])
                eff = list(bm)
            else:
                imp = {0: 0, 1: 2, 2: 3, 3: 1}[mb["ymode"]]
                eff = [imp] * 16
            above_modes[mx] = eff[12:16]
            for sy in range(4):
                left_modes[sy] = eff[sy * 4 + 3]
            tree_put(be, UV_TREE, KF_UV_PROBS, mb["uvmode"])
    part0 = be.flush()

    # token partition: one skipped frame still needs a partition (empty-ish)
    token = BoolEnc().flush()

    w, h = mb_w * 16, mb_h * 16
    tag = (len(part0) << 5) | (0 << 4) | (3 << 1) | 0
    # show_frame bit: (tag >> 4) -- set it
    tag = (len(part0) << 5) | (1 << 4) | (0 << 1) | 0
    hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF,
                 0x9D, 0x01, 0x2A]) + struct.pack("<HH", w, h)
    payload = hdr + part0 + token
    riff = b"VP8 " + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff += b"\x00"
    webp = b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff
    return webp
