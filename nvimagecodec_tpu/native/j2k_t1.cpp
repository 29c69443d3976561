// JPEG2000 Tier-1: EBCOT codeblock coder (ITU-T T.800 Annexes C & D).
// MQ arithmetic coder (T.88) + the three coding passes over bitplanes:
// significance propagation, magnitude refinement, cleanup (with run-length
// mode). Both decoder and encoder, host-side — the bit-serial half of the
// hybrid TPU J2K pipeline; the DWT/quant half runs on the TPU
// (the role nvjpeg2k's GPU stages play in the reference,
// extensions/nvjpeg2k/cuda_decoder.cpp). Written from the spec; no
// reference code used.
//
// Coefficients are sign-magnitude int32: bit 31 = sign, bits 30..0 = mag.
// Default code-block style only (no bypass/reset/termall/causal/segsym);
// Tier-2 rejects other styles before calling in.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------- MQ coder
struct QeEntry {
  uint16_t qe;
  uint8_t nmps, nlps, sw;
};

static const QeEntry kQe[47] = {
    {0x5601, 1, 1, 1},   {0x3401, 2, 6, 0},   {0x1801, 3, 9, 0},
    {0x0AC1, 4, 12, 0},  {0x0521, 5, 29, 0},  {0x0221, 38, 33, 0},
    {0x5601, 7, 6, 1},   {0x5401, 8, 14, 0},  {0x4801, 9, 14, 0},
    {0x3801, 10, 14, 0}, {0x3001, 11, 17, 0}, {0x2401, 12, 18, 0},
    {0x1C01, 13, 20, 0}, {0x1601, 29, 21, 0}, {0x5601, 15, 14, 1},
    {0x5401, 16, 14, 0}, {0x5101, 17, 15, 0}, {0x4801, 18, 16, 0},
    {0x3801, 19, 17, 0}, {0x3401, 20, 18, 0}, {0x3001, 21, 19, 0},
    {0x2801, 22, 19, 0}, {0x2401, 23, 20, 0}, {0x2201, 24, 21, 0},
    {0x1C01, 25, 22, 0}, {0x1801, 26, 23, 0}, {0x1601, 27, 24, 0},
    {0x1401, 28, 25, 0}, {0x1201, 29, 26, 0}, {0x1101, 30, 27, 0},
    {0x0AC1, 31, 28, 0}, {0x09C1, 32, 29, 0}, {0x08A1, 33, 30, 0},
    {0x0521, 34, 31, 0}, {0x0441, 35, 32, 0}, {0x02A1, 36, 33, 0},
    {0x0221, 37, 34, 0}, {0x0141, 38, 35, 0}, {0x0111, 39, 36, 0},
    {0x0085, 40, 37, 0}, {0x0049, 41, 38, 0}, {0x0025, 42, 39, 0},
    {0x0015, 43, 40, 0}, {0x0009, 44, 41, 0}, {0x0005, 45, 42, 0},
    {0x0001, 45, 43, 0}, {0x5601, 46, 46, 0},
};

constexpr int kNumCtx = 19;
// context indices
constexpr int CTX_UNI = 18;   // uniform
constexpr int CTX_RUN = 17;   // run-length

// Linked-state MQ decoder: (state index, MPS sense) pairs pre-linked into
// one node graph, so a decision is one pointer load + follow (no repeated
// kQe[] loads, no MPS-switch branch) — the classic software-MQ structure.
struct MqState {
  uint32_t qe;
  uint32_t mps;  // decision value on the MPS path
  const MqState* nmps;
  const MqState* nlps;
};
MqState kMq[47 * 2];
struct MqInit {
  MqInit() {
    for (int i = 0; i < 47; i++)
      for (int m = 0; m < 2; m++) {
        MqState& s = kMq[2 * i + m];
        s.qe = kQe[i].qe;
        s.mps = (uint32_t)m;
        s.nmps = &kMq[2 * kQe[i].nmps + m];
        s.nlps = &kMq[2 * kQe[i].nlps + (kQe[i].sw ? 1 - m : m)];
      }
  }
};
const MqInit kMqInit;

struct MQDecoder {
  const uint8_t* bp;
  const uint8_t* end;
  uint32_t c;
  uint32_t a;
  int ct;
  const MqState* ctx[kNumCtx];

  void init(const uint8_t* data, int len) {
    bp = data;
    end = data + len;
    for (int i = 0; i < kNumCtx; i++) ctx[i] = &kMq[0];
    ctx[CTX_UNI] = &kMq[2 * 46];
    ctx[CTX_RUN] = &kMq[2 * 3];
    ctx[0] = &kMq[2 * 4];  // first ZC context starts at state 4 (T.800 D.2)
    c = (uint32_t)(bp < end ? *bp : 0xFF) << 16;
    bytein();
    c <<= 7;
    ct -= 7;
    a = 0x8000;
  }

  void bytein() {
    if (bp < end && *bp == 0xFF) {
      if (bp + 1 < end && bp[1] > 0x8F) {
        c += 0xFF00;
        ct = 8;
      } else {
        bp++;
        c += (uint32_t)(bp < end ? *bp : 0xFF) << 9;
        ct = 7;
      }
    } else {
      bp++;
      c += (uint32_t)(bp < end ? *bp : 0xFF) << 8;
      ct = 8;
    }
  }

  inline int decode(int cxi) {
    const MqState* s = ctx[cxi];
    uint32_t qe = s->qe;
    uint32_t d;
    a -= qe;
    if (((c >> 16) & 0xFFFF) < qe) {
      // LPS exchange path
      if (a < qe) {
        d = s->mps;
        ctx[cxi] = s->nmps;
      } else {
        d = 1 - s->mps;
        ctx[cxi] = s->nlps;
      }
      a = qe;
      do {
        if (ct == 0) bytein();
        a <<= 1;
        c <<= 1;
        ct--;
      } while (a < 0x8000);
    } else {
      c -= (uint32_t)qe << 16;
      if ((a & 0x8000) == 0) {
        // MPS exchange path
        if (a < qe) {
          d = 1 - s->mps;
          ctx[cxi] = s->nlps;
        } else {
          d = s->mps;
          ctx[cxi] = s->nmps;
        }
        do {
          if (ct == 0) bytein();
          a <<= 1;
          c <<= 1;
          ct--;
        } while (a < 0x8000);
      } else {
        d = s->mps;
      }
    }
    return (int)d;
  }
};

struct MQEncoder {
  std::vector<uint8_t> out;
  uint32_t c;
  uint32_t a;
  int ct;
  int bp;  // index into out of pending byte (B); -1 until first byteout
  uint8_t idx[kNumCtx];
  uint8_t mps[kNumCtx];

  void init() {
    std::memset(idx, 0, sizeof(idx));
    std::memset(mps, 0, sizeof(mps));
    idx[CTX_UNI] = 46;
    idx[CTX_RUN] = 3;
    idx[0] = 4;
    a = 0x8000;
    c = 0;
    ct = 12;
    bp = -1;
  }

  void byteout() {
    if (bp >= 0 && out[bp] == 0xFF) {
      // stuff: next byte gets 7 bits
      out.push_back((uint8_t)(c >> 20));
      bp = (int)out.size() - 1;
      c &= 0xFFFFF;
      ct = 7;
    } else {
      if (c < 0x8000000) {
        out.push_back((uint8_t)(c >> 19));
        bp = (int)out.size() - 1;
        c &= 0x7FFFF;
        ct = 8;
      } else {
        // carry propagation into B
        if (bp >= 0) {
          out[bp]++;
          if (out[bp] == 0xFF) {
            c &= 0x7FFFFFF;
            out.push_back((uint8_t)(c >> 20));
            bp = (int)out.size() - 1;
            c &= 0xFFFFF;
            ct = 7;
            return;
          }
        }
        c &= 0x7FFFFFF;
        out.push_back((uint8_t)(c >> 19));
        bp = (int)out.size() - 1;
        c &= 0x7FFFF;
        ct = 8;
      }
    }
  }

  void encode(int cx, int d) {
    uint32_t qe = kQe[idx[cx]].qe;
    if (d == mps[cx]) {
      a -= qe;
      if ((a & 0x8000) == 0) {
        if (a < qe) a = qe; else c += qe;
        idx[cx] = kQe[idx[cx]].nmps;
        do {
          a <<= 1;
          c <<= 1;
          if (--ct == 0) byteout();
        } while ((a & 0x8000) == 0);
      } else {
        c += qe;
      }
    } else {
      a -= qe;
      if (a < qe) c += qe; else a = qe;
      if (kQe[idx[cx]].sw) mps[cx] = 1 - mps[cx];
      idx[cx] = kQe[idx[cx]].nlps;
      do {
        a <<= 1;
        c <<= 1;
        if (--ct == 0) byteout();
      } while ((a & 0x8000) == 0);
    }
  }

  void flush() {
    // SETBITS
    uint32_t tempc = c + a;
    c |= 0xFFFF;
    if (c >= tempc) c -= 0x8000;
    c <<= ct;
    byteout();
    c <<= ct;
    byteout();
    // trailing 0xFF bytes may be dropped: the decoder synthesizes 0xFF past
    // the end of the segment (T.88 FLUSH convention used by JPEG2000)
    while (!out.empty() && out.back() == 0xFF) out.pop_back();
  }
};

// ------------------------------------------------- T1 context modeling
// Zero-coding context lookup per band (T.800 Table D.1).
// Inputs: h = sum of horizontal significant neighbors (0-2),
//         v = vertical (0-2), d = diagonal (0-4).
static int zc_context(int band, int h, int v, int d) {
  // band: 0 LL, 1 HL, 2 LH, 3 HH. T.800 Table D.1: LL and LH use the
  // table as-is; HL (horizontally high-pass, vertical correlation)
  // interchanges H and V.
  if (band == 1) {
    int t = h; h = v; v = t;
  }
  if (band == 0 || band == 1 || band == 2) {
    if (h == 2) return 8;
    if (h == 1) {
      if (v >= 1) return 7;
      if (d >= 1) return 6;
      return 5;
    }
    if (v == 2) return 4;
    if (v == 1) return 3;
    if (d >= 2) return 2;
    if (d == 1) return 1;
    return 0;
  }
  // HH
  int hv = h + v;
  if (d >= 3) return 8;
  if (d == 2) {
    if (hv >= 1) return 7;
    return 6;
  }
  if (d == 1) {
    if (hv >= 2) return 5;
    if (hv == 1) return 4;
    return 3;
  }
  if (hv >= 2) return 2;
  if (hv == 1) return 1;
  return 0;
}

// Sign-coding context + XOR bit (T.800 Table D.2). hc/vc in {-1,0,1}:
// net sign contribution of horizontal / vertical neighbors.
static void sc_context(int hc, int vc, int* cx, int* xorbit) {
  if (hc == 1) {
    if (vc == 1) { *cx = 13; *xorbit = 0; }
    else if (vc == 0) { *cx = 12; *xorbit = 0; }
    else { *cx = 11; *xorbit = 0; }
  } else if (hc == 0) {
    if (vc == 1) { *cx = 10; *xorbit = 0; }
    else if (vc == 0) { *cx = 9; *xorbit = 0; }
    else { *cx = 10; *xorbit = 1; }
  } else {
    if (vc == 1) { *cx = 11; *xorbit = 1; }
    else if (vc == 0) { *cx = 12; *xorbit = 1; }
    else { *cx = 13; *xorbit = 1; }
  }
}

// ----------------------------------------------------------- block state
// Per-coefficient FLAG WORDS with cached neighbor state (the classic T1
// speed structure, same idea as openjpeg's flags): when a coefficient
// becomes significant it pushes its significance/sign into the flag words
// of its 8 neighbors, so every context lookup is one load + one LUT index
// instead of a 6-load neighborhood walk and a decision tree.
enum : uint32_t {
  F_SIG = 1u << 0,      // self significant
  F_VISITED = 1u << 1,  // coded in this bitplane's SPP
  F_REFINED = 1u << 2,  // refined at least once
  // cardinal neighbor significance (W/E/N/S) at bits 4..7
  F_SIG_W = 1u << 4,
  F_SIG_E = 1u << 5,
  F_SIG_N = 1u << 6,
  F_SIG_S = 1u << 7,
  // cardinal neighbor negativity at bits 8..11 (valid when sig bit set)
  F_NEG_W = 1u << 8,
  F_NEG_E = 1u << 9,
  F_NEG_N = 1u << 10,
  F_NEG_S = 1u << 11,
  // diagonal neighbor significance at bits 12..15
  F_SIG_NW = 1u << 12,
  F_SIG_NE = 1u << 13,
  F_SIG_SW = 1u << 14,
  F_SIG_SE = 1u << 15,
};
constexpr uint32_t F_NBR = 0xF0F0u;  // any neighbor significant

uint8_t kZcLut[3][256];  // [cls][sigWENS | diag4<<4] -> ZC context
uint8_t kScLut[256];     // [sigWENS | negWENS<<4] -> cx | xorbit<<5

struct T1Luts {          // fills the plain global tables once at load
  T1Luts() {
    const int bands[3] = {0, 1, 3};  // cls 0: LL/LH, 1: HL, 2: HH
    for (int idx = 0; idx < 256; idx++) {
      int hsum = (idx & 1) + ((idx >> 1) & 1);
      int vsum = ((idx >> 2) & 1) + ((idx >> 3) & 1);
      int d = ((idx >> 4) & 1) + ((idx >> 5) & 1) + ((idx >> 6) & 1) +
              ((idx >> 7) & 1);
      for (int c = 0; c < 3; c++)
        kZcLut[c][idx] = (uint8_t)zc_context(bands[c], hsum, vsum, d);
      auto contrib = [&](int sig, int neg) {
        return sig ? (neg ? -1 : 1) : 0;
      };
      int hs = contrib(idx & 1, (idx >> 4) & 1) +
               contrib((idx >> 1) & 1, (idx >> 5) & 1);
      int vs = contrib((idx >> 2) & 1, (idx >> 6) & 1) +
               contrib((idx >> 3) & 1, (idx >> 7) & 1);
      int hc = hs > 0 ? 1 : hs < 0 ? -1 : 0;
      int vc = vs > 0 ? 1 : vs < 0 ? -1 : 0;
      int cx, xorbit;
      sc_context(hc, vc, &cx, &xorbit);
      kScLut[idx] = (uint8_t)(cx | (xorbit << 5));
    }
  }
};
const T1Luts kLutInit;

inline int zc_idx(uint32_t f) {
  return (int)(((f >> 4) & 0xF) | (((f >> 12) & 0xF) << 4));
}
inline int sc_idx(uint32_t f) {
  return (int)(((f >> 4) & 0xF) | (((f >> 8) & 0xF) << 4));
}

struct T1 {
  int w, h, band, cls;
  int ws;                     // padded stride = w + 2
  std::vector<uint32_t> F;    // flags, (w+2)x(h+2) zero border
  std::vector<int32_t> mag;
  std::vector<uint8_t> sgn;   // sign bit per pixel (unpadded)

  void reset(int w_, int h_, int band_) {
    w = w_;
    h = h_;
    band = band_;
    cls = band_ == 1 ? 1 : band_ == 3 ? 2 : 0;
    ws = w + 2;
    F.assign((size_t)ws * (h + 2), 0);
    mag.assign((size_t)w * h, 0);
    sgn.assign((size_t)w * h, 0);
  }

  inline size_t pi(int x, int y) const {
    return (size_t)(y + 1) * ws + (x + 1);
  }

  // becoming significant: set own SIG and push sig/sign into the 8
  // neighbors' flag words (pad ring absorbs border writes)
  inline void mark_sig(int x, int y, int negative) {
    uint32_t* p = &F[pi(x, y)];
    p[0] |= F_SIG;
    uint32_t neg = negative ? 1u : 0u;
    p[-1] |= F_SIG_E | (neg << 9);        // west cell sees us as East
    p[1] |= F_SIG_W | (neg << 8);
    p[-ws] |= F_SIG_S | (neg << 11);      // north cell sees us as South
    p[ws] |= F_SIG_N | (neg << 10);
    p[-ws - 1] |= F_SIG_SE;
    p[-ws + 1] |= F_SIG_SW;
    p[ws - 1] |= F_SIG_NE;
    p[ws + 1] |= F_SIG_NW;
    sgn[(size_t)y * w + x] = (uint8_t)negative;
  }
};

// ---------------------------------------------------------------- decode
struct T1Decoder : T1 {
  MQDecoder mq;

  inline void decode_sign(int x, int y) {
    uint8_t v = kScLut[sc_idx(F[pi(x, y)])];
    int bit = mq.decode(v & 0x1F);
    mark_sig(x, y, bit ^ (v >> 5));
  }

  void sig_prop_pass(int bp) {
    for (int y0 = 0; y0 < h; y0 += 4)
      for (int x = 0; x < w; x++)
        for (int y = y0; y < y0 + 4 && y < h; y++) {
          uint32_t f = F[pi(x, y)];
          if ((f & F_SIG) || !(f & F_NBR)) continue;
          if (mq.decode(kZcLut[cls][zc_idx(f)])) {
            mag[(size_t)y * w + x] |= (int32_t)1 << bp;
            decode_sign(x, y);
          }
          F[pi(x, y)] |= F_VISITED;
        }
  }

  void mag_ref_pass(int bp) {
    for (int y0 = 0; y0 < h; y0 += 4)
      for (int x = 0; x < w; x++)
        for (int y = y0; y < y0 + 4 && y < h; y++) {
          uint32_t& f = F[pi(x, y)];
          if (!(f & F_SIG) || (f & F_VISITED)) continue;
          int cx = (f & F_REFINED) ? 16 : (f & F_NBR) ? 15 : 14;
          if (mq.decode(cx)) mag[(size_t)y * w + x] |= (int32_t)1 << bp;
          f |= F_REFINED | F_VISITED;
        }
  }

  void cleanup_pass(int bp) {
    for (int y0 = 0; y0 < h; y0 += 4)
      for (int x = 0; x < w; x++) {
        int y = y0;
        // run-length mode: full stripe of 4, all insignificant, no
        // significant neighbors, not visited
        if (y0 + 4 <= h) {
          bool rl = true;
          for (int yy = y0; yy < y0 + 4; yy++)
            if (F[pi(x, yy)] & (F_SIG | F_VISITED | F_NBR)) {
              rl = false;
              break;
            }
          if (rl) {
            if (mq.decode(CTX_RUN) == 0) {
              for (int yy = y0; yy < y0 + 4; yy++)
                F[pi(x, yy)] &= ~F_VISITED;
              continue;  // whole column stays zero
            }
            int r = (mq.decode(CTX_UNI) << 1) | mq.decode(CTX_UNI);
            y = y0 + r;
            mag[(size_t)y * w + x] |= (int32_t)1 << bp;
            decode_sign(x, y);
            y++;
          }
        }
        for (; y < y0 + 4 && y < h; y++) {
          uint32_t f = F[pi(x, y)];
          if (!(f & (F_SIG | F_VISITED))) {
            if (mq.decode(kZcLut[cls][zc_idx(f)])) {
              mag[(size_t)y * w + x] |= (int32_t)1 << bp;
              decode_sign(x, y);
            }
          }
        }
        for (int yy = y0; yy < y0 + 4 && yy < h; yy++)
          F[pi(x, yy)] &= ~F_VISITED;
      }
  }
};

// ---------------------------------------------------------------- encode
struct T1Encoder : T1 {
  MQEncoder mq;

  inline void encode_sign(int x, int y) {
    uint8_t v = kScLut[sc_idx(F[pi(x, y)])];
    int neg = sgn[(size_t)y * w + x];
    mq.encode(v & 0x1F, neg ^ (v >> 5));
    mark_sig(x, y, neg);
  }

  void sig_prop_pass(int bp) {
    for (int y0 = 0; y0 < h; y0 += 4)
      for (int x = 0; x < w; x++)
        for (int y = y0; y < y0 + 4 && y < h; y++) {
          uint32_t f = F[pi(x, y)];
          if ((f & F_SIG) || !(f & F_NBR)) continue;
          int bit = (mag[(size_t)y * w + x] >> bp) & 1;
          mq.encode(kZcLut[cls][zc_idx(f)], bit);
          if (bit) encode_sign(x, y);
          F[pi(x, y)] |= F_VISITED;
        }
  }

  void mag_ref_pass(int bp) {
    for (int y0 = 0; y0 < h; y0 += 4)
      for (int x = 0; x < w; x++)
        for (int y = y0; y < y0 + 4 && y < h; y++) {
          uint32_t& f = F[pi(x, y)];
          if (!(f & F_SIG) || (f & F_VISITED)) continue;
          int cx = (f & F_REFINED) ? 16 : (f & F_NBR) ? 15 : 14;
          mq.encode(cx, (mag[(size_t)y * w + x] >> bp) & 1);
          f |= F_REFINED | F_VISITED;
        }
  }

  void cleanup_pass(int bp) {
    for (int y0 = 0; y0 < h; y0 += 4)
      for (int x = 0; x < w; x++) {
        int y = y0;
        if (y0 + 4 <= h) {
          bool rl = true;
          for (int yy = y0; yy < y0 + 4; yy++)
            if (F[pi(x, yy)] & (F_SIG | F_VISITED | F_NBR)) {
              rl = false;
              break;
            }
          if (rl) {
            int first = -1;
            for (int yy = y0; yy < y0 + 4; yy++)
              if ((mag[(size_t)yy * w + x] >> bp) & 1) {
                first = yy;
                break;
              }
            if (first < 0) {
              mq.encode(CTX_RUN, 0);
              for (int yy = y0; yy < y0 + 4; yy++)
                F[pi(x, yy)] &= ~F_VISITED;
              continue;
            }
            mq.encode(CTX_RUN, 1);
            int r = first - y0;
            mq.encode(CTX_UNI, (r >> 1) & 1);
            mq.encode(CTX_UNI, r & 1);
            encode_sign(x, first);
            y = first + 1;
          }
        }
        for (; y < y0 + 4 && y < h; y++) {
          uint32_t f = F[pi(x, y)];
          if (!(f & (F_SIG | F_VISITED))) {
            int bit = (mag[(size_t)y * w + x] >> bp) & 1;
            mq.encode(kZcLut[cls][zc_idx(f)], bit);
            if (bit) encode_sign(x, y);
          }
        }
        for (int yy = y0; yy < y0 + 4 && yy < h; yy++)
          F[pi(x, yy)] &= ~F_VISITED;
      }
  }
};

}  // namespace

extern "C" {

// Decode one codeblock. data: single codeword segment (default style).
// num_bps: magnitude bitplanes present (Mb - zero_bitplanes).
// num_passes: coding passes included (first bitplane has cleanup only).
// out: w*h int32, signed reconstruction value (no dequant; caller applies).
int tic_j2k_t1_decode(const uint8_t* data, int len, int w, int h, int band,
                      int num_bps, int num_passes, int32_t* out) {
  if (w <= 0 || h <= 0 || w > 4096 || h > 4096 || num_bps < 0 ||
      num_bps > 31 || num_passes < 0)
    return 1;
  T1Decoder t;
  t.reset(w, h, band);
  t.mq.init(data, len);
  int pass = 0;
  for (int bp = num_bps - 1; bp >= 0 && pass < num_passes; bp--) {
    if (bp == num_bps - 1) {
      t.cleanup_pass(bp);
      pass++;
    } else {
      if (pass < num_passes) {
        t.sig_prop_pass(bp);
        pass++;
      }
      if (pass < num_passes) {
        t.mag_ref_pass(bp);
        pass++;
      }
      if (pass < num_passes) {
        t.cleanup_pass(bp);
        pass++;
      }
    }
  }
  for (int i = 0; i < w * h; i++)
    out[i] = t.sgn[i] ? -t.mag[i] : t.mag[i];
  return 0;
}

// Encode one codeblock from signed int32 coefficients. Returns the number
// of magnitude bitplanes used via *num_bps and passes via *num_passes;
// caller provides out buffer of cap bytes, gets *outlen written.
int tic_j2k_t1_encode(const int32_t* in, int w, int h, int band,
                      uint8_t* out_buf, int cap, int* outlen, int* num_bps,
                      int* num_passes) {
  if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return 1;
  T1Encoder t;
  t.reset(w, h, band);
  int32_t maxmag = 0;
  for (int i = 0; i < w * h; i++) {
    int32_t v = in[i];
    int32_t m = v < 0 ? -v : v;
    t.mag[i] = m;
    t.sgn[i] = v < 0;
    if (m > maxmag) maxmag = m;
  }
  int nbps = 0;
  while ((1 << nbps) <= maxmag) nbps++;
  *num_bps = nbps;
  if (nbps == 0) {
    *num_passes = 0;
    *outlen = 0;
    return 0;
  }
  t.mq.init();
  int pass = 0;
  for (int bp = nbps - 1; bp >= 0; bp--) {
    if (bp == nbps - 1) {
      t.cleanup_pass(bp);
      pass++;
    } else {
      t.sig_prop_pass(bp);
      pass++;
      t.mag_ref_pass(bp);
      pass++;
      t.cleanup_pass(bp);
      pass++;
    }
  }
  t.mq.flush();
  *num_passes = pass;
  if ((int)t.mq.out.size() > cap) return 2;
  std::memcpy(out_buf, t.mq.out.data(), t.mq.out.size());
  *outlen = (int)t.mq.out.size();
  return 0;
}

}  // extern "C"
