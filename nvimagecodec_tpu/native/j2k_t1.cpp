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

struct MQDecoder {
  const uint8_t* bp;
  const uint8_t* end;
  uint32_t c;
  uint32_t a;
  int ct;
  uint8_t idx[kNumCtx];  // state index per context
  uint8_t mps[kNumCtx];

  void init(const uint8_t* data, int len) {
    bp = data;
    end = data + len;
    std::memset(idx, 0, sizeof(idx));
    std::memset(mps, 0, sizeof(mps));
    idx[CTX_UNI] = 46;
    idx[CTX_RUN] = 3;
    idx[0] = 4;  // first ZC context starts at state 4 (T.800 D.2)
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

  int decode(int cx) {
    int d;
    uint32_t qe = kQe[idx[cx]].qe;
    a -= qe;
    if (((c >> 16) & 0xFFFF) < qe) {
      // LPS exchange path
      if (a < qe) {
        d = mps[cx];
        idx[cx] = kQe[idx[cx]].nmps;
      } else {
        d = 1 - mps[cx];
        if (kQe[idx[cx]].sw) mps[cx] = 1 - mps[cx];
        idx[cx] = kQe[idx[cx]].nlps;
      }
      a = qe;
      // renorm
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
          d = 1 - mps[cx];
          if (kQe[idx[cx]].sw) mps[cx] = 1 - mps[cx];
          idx[cx] = kQe[idx[cx]].nlps;
        } else {
          d = mps[cx];
          idx[cx] = kQe[idx[cx]].nmps;
        }
        do {
          if (ct == 0) bytein();
          a <<= 1;
          c <<= 1;
          ct--;
        } while (a < 0x8000);
      } else {
        d = mps[cx];
      }
    }
    return d;
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
struct T1 {
  int w, h, band;
  int ws;                        // padded stride = w + 2
  std::vector<uint8_t> sig;      // significance, (w+2)x(h+2) zero border
  std::vector<int8_t> sgnc;      // sign contribution: 0 insig, +1, -1 (padded)
  std::vector<uint8_t> visited;  // coded in current bitplane's SPP
  std::vector<uint8_t> refined;  // has been refined at least once
  std::vector<int32_t> mag;
  std::vector<uint8_t> sgn;      // sign bit per pixel (unpadded)

  void reset(int w_, int h_, int band_) {
    w = w_;
    h = h_;
    band = band_;
    ws = w + 2;
    sig.assign((size_t)ws * (h + 2), 0);
    sgnc.assign((size_t)ws * (h + 2), 0);
    visited.assign((size_t)w * h, 0);
    refined.assign((size_t)w * h, 0);
    mag.assign((size_t)w * h, 0);
    sgn.assign((size_t)w * h, 0);
  }

  inline size_t pi(int x, int y) const {
    return (size_t)(y + 1) * ws + (x + 1);
  }

  inline bool is_sig(int x, int y) const { return sig[pi(x, y)] != 0; }

  inline void mark_sig(int x, int y, int negative) {
    sig[pi(x, y)] = 1;
    sgnc[pi(x, y)] = negative ? -1 : 1;
    sgn[(size_t)y * w + x] = (uint8_t)negative;
  }

  // padded unchecked neighbor sums (border cells are zero)
  inline void neighborhood(int x, int y, int* hs, int* vs, int* ds) const {
    const uint8_t* c = &sig[pi(x, y)];
    *hs = c[-1] + c[1];
    *vs = c[-ws] + c[ws];
    *ds = c[-ws - 1] + c[-ws + 1] + c[ws - 1] + c[ws + 1];
  }

  inline void sign_contrib(int x, int y, int* hc, int* vc) const {
    const int8_t* c = &sgnc[pi(x, y)];
    int hsum = c[-1] + c[1];
    int vsum = c[-ws] + c[ws];
    *hc = hsum > 0 ? 1 : hsum < 0 ? -1 : 0;
    *vc = vsum > 0 ? 1 : vsum < 0 ? -1 : 0;
  }
};

// ---------------------------------------------------------------- decode
struct T1Decoder : T1 {
  MQDecoder mq;

  void decode_sign(int x, int y) {
    int hc, vc, cx, xorbit;
    sign_contrib(x, y, &hc, &vc);
    sc_context(hc, vc, &cx, &xorbit);
    int bit = mq.decode(cx);
    sgnc[pi(x, y)] = (int8_t)((bit ^ xorbit) ? -1 : 1);
    sgn[(size_t)y * w + x] = (uint8_t)(bit ^ xorbit);
  }

  void sig_prop_pass(int bp) {
    for (int y0 = 0; y0 < h; y0 += 4)
      for (int x = 0; x < w; x++)
        for (int y = y0; y < y0 + 4 && y < h; y++) {
          size_t i = (size_t)y * w + x;
          if (sig[pi(x, y)]) continue;
          int hs, vs, ds;
          neighborhood(x, y, &hs, &vs, &ds);
          if (hs + vs + ds == 0) continue;
          int cx = zc_context(band, hs, vs, ds);
          if (mq.decode(cx)) {
            sig[pi(x, y)] = 1;
            mag[i] |= (int32_t)1 << bp;
            decode_sign(x, y);
          }
          visited[i] = 1;
        }
  }

  void mag_ref_pass(int bp) {
    for (int y0 = 0; y0 < h; y0 += 4)
      for (int x = 0; x < w; x++)
        for (int y = y0; y < y0 + 4 && y < h; y++) {
          size_t i = (size_t)y * w + x;
          if (!sig[pi(x, y)] || visited[i]) continue;
          int cx;
          if (!refined[i]) {
            int hs, vs, ds;
            neighborhood(x, y, &hs, &vs, &ds);
            cx = (hs + vs + ds > 0) ? 15 : 14;
          } else {
            cx = 16;
          }
          if (mq.decode(cx)) mag[i] |= (int32_t)1 << bp;
          refined[i] = 1;
          visited[i] = 1;
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
          for (int yy = y0; yy < y0 + 4; yy++) {
            size_t i = (size_t)yy * w + x;
            int hs, vs, ds;
            neighborhood(x, yy, &hs, &vs, &ds);
            if (sig[pi(x, yy)] || visited[i] || hs + vs + ds != 0) {
              rl = false;
              break;
            }
          }
          if (rl) {
            if (mq.decode(CTX_RUN) == 0) {
              for (int yy = y0; yy < y0 + 4; yy++)
                visited[(size_t)yy * w + x] = 0;
              continue;  // whole column stays zero
            }
            int r = (mq.decode(CTX_UNI) << 1) | mq.decode(CTX_UNI);
            y = y0 + r;
            sig[pi(x, y)] = 1;
            mag[(size_t)y * w + x] |= (int32_t)1 << bp;
            decode_sign(x, y);
            y++;
          }
        }
        for (; y < y0 + 4 && y < h; y++) {
          size_t i = (size_t)y * w + x;
          if (!sig[pi(x, y)] && !visited[i]) {
            int hs, vs, ds;
            neighborhood(x, y, &hs, &vs, &ds);
            int cx = zc_context(band, hs, vs, ds);
            if (mq.decode(cx)) {
              sig[pi(x, y)] = 1;
              mag[i] |= (int32_t)1 << bp;
              decode_sign(x, y);
            }
          }
        }
        for (int yy = y0; yy < y0 + 4 && yy < h; yy++)
          visited[(size_t)yy * w + x] = 0;
      }
  }
};

// ---------------------------------------------------------------- encode
struct T1Encoder : T1 {
  MQEncoder mq;

  void encode_sign(int x, int y) {
    int hc, vc, cx, xorbit;
    sign_contrib(x, y, &hc, &vc);
    sc_context(hc, vc, &cx, &xorbit);
    int neg = sgn[(size_t)y * w + x];
    mq.encode(cx, neg ^ xorbit);
    sgnc[pi(x, y)] = (int8_t)(neg ? -1 : 1);
  }

  void sig_prop_pass(int bp) {
    for (int y0 = 0; y0 < h; y0 += 4)
      for (int x = 0; x < w; x++)
        for (int y = y0; y < y0 + 4 && y < h; y++) {
          size_t i = (size_t)y * w + x;
          if (sig[pi(x, y)]) continue;
          int hs, vs, ds;
          neighborhood(x, y, &hs, &vs, &ds);
          if (hs + vs + ds == 0) continue;
          int cx = zc_context(band, hs, vs, ds);
          int bit = (mag[i] >> bp) & 1;
          mq.encode(cx, bit);
          if (bit) {
            sig[pi(x, y)] = 1;
            encode_sign(x, y);
          }
          visited[i] = 1;
        }
  }

  void mag_ref_pass(int bp) {
    for (int y0 = 0; y0 < h; y0 += 4)
      for (int x = 0; x < w; x++)
        for (int y = y0; y < y0 + 4 && y < h; y++) {
          size_t i = (size_t)y * w + x;
          if (!sig[pi(x, y)] || visited[i]) continue;
          int cx;
          if (!refined[i]) {
            int hs, vs, ds;
            neighborhood(x, y, &hs, &vs, &ds);
            cx = (hs + vs + ds > 0) ? 15 : 14;
          } else {
            cx = 16;
          }
          mq.encode(cx, (mag[i] >> bp) & 1);
          refined[i] = 1;
          visited[i] = 1;
        }
  }

  void cleanup_pass(int bp) {
    for (int y0 = 0; y0 < h; y0 += 4)
      for (int x = 0; x < w; x++) {
        int y = y0;
        if (y0 + 4 <= h) {
          bool rl = true;
          for (int yy = y0; yy < y0 + 4; yy++) {
            size_t i = (size_t)yy * w + x;
            int hs, vs, ds;
            neighborhood(x, yy, &hs, &vs, &ds);
            if (sig[pi(x, yy)] || visited[i] || hs + vs + ds != 0) {
              rl = false;
              break;
            }
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
                visited[(size_t)yy * w + x] = 0;
              continue;
            }
            mq.encode(CTX_RUN, 1);
            int r = first - y0;
            mq.encode(CTX_UNI, (r >> 1) & 1);
            mq.encode(CTX_UNI, r & 1);
            sig[pi(x, first)] = 1;
            encode_sign(x, first);
            y = first + 1;
          }
        }
        for (; y < y0 + 4 && y < h; y++) {
          size_t i = (size_t)y * w + x;
          if (!sig[pi(x, y)] && !visited[i]) {
            int hs, vs, ds;
            neighborhood(x, y, &hs, &vs, &ds);
            int cx = zc_context(band, hs, vs, ds);
            int bit = (mag[i] >> bp) & 1;
            mq.encode(cx, bit);
            if (bit) {
              sig[pi(x, y)] = 1;
              encode_sign(x, y);
            }
          }
        }
        for (int yy = y0; yy < y0 + 4 && yy < h; yy++)
          visited[(size_t)yy * w + x] = 0;
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
