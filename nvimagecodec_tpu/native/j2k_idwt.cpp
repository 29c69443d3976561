// Native multi-level inverse 5/3 DWT (ITU-T T.800 Annex F) for the
// reversible J2K host decode path — the numpy lifting in ops/dwt.py is
// the TPU/jax path; this is the host-CPU fast path (~4x faster than the
// vectorized-numpy equivalent on tile-sized planes).
//
// Layout matches ops/dwt.py: bands finest-first (HL, LH, HH per level),
// LL coarsest; per-level sizes and parities derive from the absolute
// tile-component origin (oy, ox) — see ops/dwt.py subband_dims /
// _level_parity. Horizontal synthesis first on the (L,H) row pairs, then
// vertical interleave, identical operation order to idwt2d_level (the
// integer lifting is order-sensitive; outputs are bit-identical).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// split sizes of a length-n segment starting at parity p:
// low band = absolute-even positions.
static inline int nlow(int n, int p) { return p ? n / 2 : (n + 1) / 2; }

// 1D inverse 5/3 on one row: L[nl], H[nh] -> out[n], segment start parity p.
static void inv53_row(const int32_t* L, const int32_t* H, int32_t* out,
                      int n, int p) {
    if (n <= 0) return;  // odd-origin length-1 parents have empty children
    int nl = nlow(n, p), nh = n - nl;
    if (nh == 0) { out[0] = L[0]; return; }
    if (nl == 0) { out[0] = H[0] >> 1; return; }
    // low (abs-even) samples first, into their interleaved slots
    if (!p) {
        // even[k] = L[k] - ((H[k-1] + H[k] + 2) >> 2), clamp both ends
        for (int k = 0; k < nl; k++) {
            int32_t hl = H[k > 0 ? k - 1 : 0];
            int32_t hc = H[k < nh ? k : nh - 1];
            out[2 * k] = L[k] - ((hl + hc + 2) >> 2);
        }
        // odd[k] = H[k] + ((even[k] + even[k+1]) >> 1)
        for (int k = 0; k < nh; k++) {
            int32_t el = out[2 * k];
            int32_t er = out[2 * k + 2 <= 2 * (nl - 1) ? 2 * k + 2
                                                       : 2 * (nl - 1)];
            out[2 * k + 1] = H[k] + ((el + er) >> 1);
        }
    } else {
        // low at local odd slots: low[k] = L[k] - ((H[k] + H[k+1] + 2) >> 2)
        for (int k = 0; k < nl; k++) {
            int32_t hc = H[k];
            int32_t hr = H[k + 1 < nh ? k + 1 : nh - 1];
            out[2 * k + 1] = L[k] - ((hc + hr + 2) >> 2);
        }
        // high at local even: high[k] = H[k] + ((low[k-1] + low[k]) >> 1)
        for (int k = 0; k < nh; k++) {
            int32_t ll = out[k > 0 ? 2 * k - 1 : 1];
            int32_t lc = out[2 * k + 1 <= 2 * (nl - 1) + 1 ? 2 * k + 1
                                                           : 2 * nl - 1];
            out[2 * k] = H[k] + ((ll + lc) >> 1);
        }
    }
}

// vertical inverse 5/3 across rows, vectorized along the row (width w):
// Ly [hl x w], Hy [hh x w] -> out [n x w], start parity p.
static void inv53_cols(const int32_t* Ly, const int32_t* Hy, int32_t* out,
                       int n, int w, int p) {
    if (n <= 0 || w <= 0) return;
    int nl = nlow(n, p), nh = n - nl;
    if (nh == 0) { memcpy(out, Ly, sizeof(int32_t) * w); return; }
    if (nl == 0) {
        for (int x = 0; x < w; x++) out[x] = Hy[x] >> 1;
        return;
    }
    auto orow = [&](int r) { return out + size_t(r) * w; };
    auto lrow = [&](int k) { return Ly + size_t(k) * w; };
    auto hrow = [&](int k) { return Hy + size_t(k) * w; };
    if (!p) {
        for (int k = 0; k < nl; k++) {
            const int32_t* hl = hrow(k > 0 ? k - 1 : 0);
            const int32_t* hc = hrow(k < nh ? k : nh - 1);
            const int32_t* l = lrow(k);
            int32_t* o = orow(2 * k);
            for (int x = 0; x < w; x++)
                o[x] = l[x] - ((hl[x] + hc[x] + 2) >> 2);
        }
        for (int k = 0; k < nh; k++) {
            const int32_t* el = orow(2 * k);
            const int32_t* er = orow(k + 1 < nl ? 2 * k + 2 : 2 * (nl - 1));
            const int32_t* h = hrow(k);
            int32_t* o = orow(2 * k + 1);
            for (int x = 0; x < w; x++)
                o[x] = h[x] + ((el[x] + er[x]) >> 1);
        }
    } else {
        for (int k = 0; k < nl; k++) {
            const int32_t* hc = hrow(k);
            const int32_t* hr = hrow(k + 1 < nh ? k + 1 : nh - 1);
            const int32_t* l = lrow(k);
            int32_t* o = orow(2 * k + 1);
            for (int x = 0; x < w; x++)
                o[x] = l[x] - ((hc[x] + hr[x] + 2) >> 2);
        }
        for (int k = 0; k < nh; k++) {
            const int32_t* ll = orow(k > 0 ? 2 * k - 1 : 1);
            const int32_t* lc = orow(k < nl ? 2 * k + 1 : 2 * nl - 1);
            const int32_t* h = hrow(k);
            int32_t* o = orow(2 * k);
            for (int x = 0; x < w; x++)
                o[x] = h[x] + ((ll[x] + lc[x]) >> 1);
        }
    }
}

static inline int ceildiv(int a, int b) { return (a + b - 1) / b; }

}  // namespace

extern "C" {

// Multi-level inverse 5/3. bands: 3*levels pointers, finest-first
// (HL, LH, HH per level); LL: coarsest low band. out: th*tw int32.
// (oy, ox): absolute tile-component origin (drives per-level sizes and
// lifting parities). Returns 0.
int tic_idwt53(const int32_t* LL, const int32_t* const* bands, int levels,
               int th, int tw, int oy, int ox, int32_t* out) {
    if (levels == 0) {
        memcpy(out, LL, sizeof(int32_t) * size_t(th) * tw);
        return 0;
    }
    int y1 = oy + th, x1 = ox + tw;
    // per-scale segment dims: level s occupies [ceil(c0/2^s), ceil(c1/2^s))
    std::vector<int> hs(levels + 1), ws(levels + 1), py(levels + 1),
        px(levels + 1);
    for (int s = 0; s <= levels; s++) {
        int d = 1 << s;
        int yy0 = ceildiv(oy, d), xx0 = ceildiv(ox, d);
        hs[s] = ceildiv(y1, d) - yy0;
        ws[s] = ceildiv(x1, d) - xx0;
        py[s] = yy0 & 1;
        px[s] = xx0 & 1;
    }
    std::vector<int32_t> cur(LL, LL + size_t(hs[levels]) * ws[levels]);
    std::vector<int32_t> Ly, Hy, nxt, rowbuf;
    for (int lev = levels - 1; lev >= 0; lev--) {
        int h = hs[lev], w = ws[lev];
        int hl = nlow(h, py[lev]);
        int hh = h - hl;
        int wl = nlow(w, px[lev]);
        int wh = w - wl;
        const int32_t* HL = bands[3 * lev + 0];
        const int32_t* LH = bands[3 * lev + 1];
        const int32_t* HH = bands[3 * lev + 2];
        Ly.resize(size_t(hl) * w);
        Hy.resize(size_t(hh) * w);
        // horizontal synth row-by-row
        for (int r = 0; r < hl; r++)
            inv53_row(cur.data() + size_t(r) * wl, HL + size_t(r) * wh,
                      Ly.data() + size_t(r) * w, w, px[lev]);
        for (int r = 0; r < hh; r++)
            inv53_row(LH + size_t(r) * wl, HH + size_t(r) * wh,
                      Hy.data() + size_t(r) * w, w, px[lev]);
        int32_t* dst;
        if (lev == 0) {
            dst = out;
        } else {
            nxt.resize(size_t(h) * w);
            dst = nxt.data();
        }
        inv53_cols(Ly.data(), Hy.data(), dst, h, w, py[lev]);
        if (lev != 0) cur.swap(nxt);
    }
    return 0;
}

}  // extern "C"

// ----------------------------------------------------------------- forward
namespace {

// 1D forward 5/3 on one row: in[n] -> L[nl], H[nh], start parity p.
// Mirrors ops/dwt._fwd_lift_53 exactly (including its boundary clamps).
static void fwd53_row(const int32_t* in, int32_t* L, int32_t* H, int n,
                      int p) {
    if (n <= 0) return;
    int nl = nlow(n, p), nh = n - nl;
    if (n == 1) {
        if (p) H[0] = in[0] * 2;
        else L[0] = in[0];
        return;
    }
    if (!p) {
        // H[k] = x[2k+1] - ((x[2k] + x[2k+2]) >> 1), right clamp
        for (int k = 0; k < nh; k++) {
            int32_t lc = in[2 * k];
            int32_t lr = in[k + 1 < nl ? 2 * (k + 1) : 2 * (nl - 1)];
            H[k] = in[2 * k + 1] - ((lc + lr) >> 1);
        }
        for (int k = 0; k < nl; k++) {
            int32_t hl = H[k > 0 ? k - 1 : 0];
            int32_t hc = H[k < nh ? k : nh - 1];
            L[k] = in[2 * k] + ((hl + hc + 2) >> 2);
        }
    } else {
        // low at local odd slots, high at local even
        for (int k = 0; k < nh; k++) {
            int32_t ll = in[k > 0 ? 2 * (k - 1) + 1 : 1];
            int32_t lc = in[k < nl ? 2 * k + 1 : 2 * (nl - 1) + 1];
            H[k] = in[2 * k] - ((ll + lc) >> 1);
        }
        for (int k = 0; k < nl; k++) {
            int32_t hc = H[k];
            int32_t hr = H[k + 1 < nh ? k + 1 : nh - 1];
            L[k] = in[2 * k + 1] + ((hc + hr + 2) >> 2);
        }
    }
}

// vertical forward across rows, vectorized along width
static void fwd53_cols(const int32_t* in, int32_t* Ly, int32_t* Hy, int n,
                       int w, int p) {
    if (n <= 0 || w <= 0) return;
    int nl = nlow(n, p), nh = n - nl;
    auto irow = [&](int r) { return in + size_t(r) * w; };
    auto lrow = [&](int k) { return Ly + size_t(k) * w; };
    auto hrow = [&](int k) { return Hy + size_t(k) * w; };
    if (n == 1) {
        if (p) for (int x = 0; x < w; x++) Hy[x] = in[x] * 2;
        else memcpy(Ly, in, sizeof(int32_t) * w);
        return;
    }
    if (!p) {
        for (int k = 0; k < nh; k++) {
            const int32_t* lc = irow(2 * k);
            const int32_t* lr = irow(k + 1 < nl ? 2 * (k + 1) : 2 * (nl - 1));
            const int32_t* xc = irow(2 * k + 1);
            int32_t* o = hrow(k);
            for (int x = 0; x < w; x++)
                o[x] = xc[x] - ((lc[x] + lr[x]) >> 1);
        }
        for (int k = 0; k < nl; k++) {
            const int32_t* hl = hrow(k > 0 ? k - 1 : 0);
            const int32_t* hc = hrow(k < nh ? k : nh - 1);
            const int32_t* xc = irow(2 * k);
            int32_t* o = lrow(k);
            for (int x = 0; x < w; x++)
                o[x] = xc[x] + ((hl[x] + hc[x] + 2) >> 2);
        }
    } else {
        for (int k = 0; k < nh; k++) {
            const int32_t* ll = irow(k > 0 ? 2 * (k - 1) + 1 : 1);
            const int32_t* lc = irow(k < nl ? 2 * k + 1 : 2 * (nl - 1) + 1);
            const int32_t* xc = irow(2 * k);
            int32_t* o = hrow(k);
            for (int x = 0; x < w; x++)
                o[x] = xc[x] - ((ll[x] + lc[x]) >> 1);
        }
        for (int k = 0; k < nl; k++) {
            const int32_t* hc = hrow(k);
            const int32_t* hr = hrow(k + 1 < nh ? k + 1 : nh - 1);
            const int32_t* xc = irow(2 * k + 1);
            int32_t* o = lrow(k);
            for (int x = 0; x < w; x++)
                o[x] = xc[x] + ((hc[x] + hr[x] + 2) >> 2);
        }
    }
}

}  // namespace

extern "C" {

// Multi-level forward 5/3: in [th, tw] int32; bands: 3*levels pointers,
// finest-first (HL, LH, HH); LL: coarsest low band. (oy, ox): absolute
// tile-component origin (per-level sizes + parities, same convention as
// tic_idwt53). Column pass first, then rows — the T.800-normative order
// ops/dwt.dwt2d_level uses; outputs are bit-identical to it.
int tic_fdwt53(const int32_t* in, int levels, int th, int tw, int oy,
               int ox, int32_t* LL, int32_t* const* bands) {
    if (levels == 0) {
        memcpy(LL, in, sizeof(int32_t) * size_t(th) * tw);
        return 0;
    }
    int y1 = oy + th, x1 = ox + tw;
    std::vector<int> hs(levels + 1), ws(levels + 1), py(levels + 1),
        px(levels + 1);
    for (int s = 0; s <= levels; s++) {
        int d = 1 << s;
        int yy0 = ceildiv(oy, d), xx0 = ceildiv(ox, d);
        hs[s] = ceildiv(y1, d) - yy0;
        ws[s] = ceildiv(x1, d) - xx0;
        py[s] = yy0 & 1;
        px[s] = xx0 & 1;
    }
    std::vector<int32_t> cur(in, in + size_t(th) * tw);
    std::vector<int32_t> Ly, Hy, rl, rh;
    for (int s = 0; s < levels; s++) {
        int h = hs[s], w = ws[s];
        int nly = nlow(h, py[s]), nhy = h - nly;
        int nlx = nlow(w, px[s]), nhx = w - nlx;
        Ly.assign(size_t(nly) * w, 0);
        Hy.assign(size_t(nhy) * w, 0);
        fwd53_cols(cur.data(), Ly.data(), Hy.data(), h, w, py[s]);
        // rows of Ly -> (next LL | HL); rows of Hy -> (LH | HH)
        int32_t* HL = (int32_t*)bands[3 * s + 0];
        int32_t* LH = (int32_t*)bands[3 * s + 1];
        int32_t* HH = (int32_t*)bands[3 * s + 2];
        std::vector<int32_t> nxt(size_t(nly) * nlx);
        rl.assign(size_t(nlx ? nlx : 1), 0);
        rh.assign(size_t(nhx ? nhx : 1), 0);
        for (int r = 0; r < nly; r++) {
            fwd53_row(Ly.data() + size_t(r) * w, nxt.data() + size_t(r) * nlx,
                      HL + size_t(r) * nhx, w, px[s]);
        }
        for (int r = 0; r < nhy; r++) {
            fwd53_row(Hy.data() + size_t(r) * w, LH + size_t(r) * nlx,
                      HH + size_t(r) * nhx, w, px[s]);
        }
        cur.swap(nxt);
    }
    memcpy(LL, cur.data(), sizeof(int32_t) * cur.size());
    return 0;
}

}  // extern "C"
