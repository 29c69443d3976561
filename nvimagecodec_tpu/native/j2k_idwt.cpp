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
// Interior loops are contiguous and branch-free (boundary clamps peeled)
// so the compiler vectorizes them; the interleaved final store is a
// stride-2 pattern gcc emits shuffled vector stores for.
static void inv53_row(const int32_t* L, const int32_t* H, int32_t* out,
                      int n, int p) {
    if (n <= 0) return;  // odd-origin length-1 parents have empty children
    int nl = nlow(n, p), nh = n - nl;
    if (nh == 0) { out[0] = L[0]; return; }
    if (nl == 0) { out[0] = H[0] >> 1; return; }
    static thread_local std::vector<int32_t> scratch;
    if (int(scratch.size()) < n + 2) scratch.resize(n + 2);
    int32_t* e = scratch.data();       // low-band lifted values
    int32_t* o = e + nl + 1;           // high-band lifted values
    if (!p) {
        // even[k] = L[k] - ((H[k-1] + H[k] + 2) >> 2), clamp both ends
        e[0] = L[0] - ((2 * H[0] + 2) >> 2);
        const int ke = nl < nh ? nl : nh;  // ks.t. k-1 and k in range
        for (int k = 1; k < ke; k++)
            e[k] = L[k] - ((H[k - 1] + H[k] + 2) >> 2);
        for (int k = ke > 1 ? ke : 1; k < nl; k++)  // nh < k < nl tail
            e[k] = L[k] - ((2 * H[nh - 1] + 2) >> 2);
        // odd[k] = H[k] + ((even[k] + even[k+1]) >> 1)
        for (int k = 0; k < nh - 1; k++)
            o[k] = H[k] + ((e[k] + e[k + 1]) >> 1);
        {
            int k = nh - 1;
            int32_t er = e[k + 1 < nl ? k + 1 : nl - 1];
            o[k] = H[k] + ((e[k] + er) >> 1);
        }
        const int np_ = nl < nh ? nl : nh;
        for (int k = 0; k < np_; k++) {
            out[2 * k] = e[k];
            out[2 * k + 1] = o[k];
        }
        if (nl > nh) out[2 * nl - 2] = e[nl - 1];
    } else {
        // low at local odd slots: low[k] = L[k] - ((H[k] + H[k+1] + 2) >> 2)
        const int ke = nl < nh - 1 ? nl : nh - 1;
        for (int k = 0; k < ke; k++)
            e[k] = L[k] - ((H[k] + H[k + 1] + 2) >> 2);
        for (int k = ke > 0 ? ke : 0; k < nl; k++)
            e[k] = L[k] - ((2 * H[nh - 1] + 2) >> 2);
        // high at local even: high[k] = H[k] + ((low[k-1] + low[k]) >> 1)
        o[0] = H[0] + ((e[0] + e[0]) >> 1);
        const int kh = nh < nl + 1 ? nh : nl + 1;
        for (int k = 1; k < kh; k++) {
            int32_t lc = e[k < nl ? k : nl - 1];
            o[k] = H[k] + ((e[k - 1] + lc) >> 1);
        }
        for (int k = kh; k < nh; k++)
            o[k] = H[k] + ((e[nl - 1] + e[nl - 1]) >> 1);
        const int np_ = nl < nh ? nl : nh;
        for (int k = 0; k < np_; k++) {
            out[2 * k] = o[k];
            out[2 * k + 1] = e[k];
        }
        if (nh > nl) out[2 * nh - 2] = o[nh - 1];
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
    std::vector<int32_t> nxt, ring;
    for (int lev = levels - 1; lev >= 0; lev--) {
        int h = hs[lev], w = ws[lev];
        int hl = nlow(h, py[lev]);
        int hh = h - hl;
        int wl = nlow(w, px[lev]);
        int wh = w - wl;
        const int px_ = px[lev];
        const int32_t* HL = bands[3 * lev + 0];
        const int32_t* LH = bands[3 * lev + 1];
        const int32_t* HH = bands[3 * lev + 2];
        int32_t* dst;
        if (lev == 0) {
            dst = out;
        } else {
            nxt.resize(size_t(h) * w);
            dst = nxt.data();
        }
        // STREAMING vertical synthesis fused with on-demand horizontal
        // rows: the full-plane Ly/Hy intermediates (2 extra sweeps of
        // main-memory traffic per level) are replaced by a 3-row ring —
        // each horizontal row is produced right before the vertical
        // lifting consumes it, and even (E) rows are read back from dst
        // while still cache-hot. Bit-identical operation order.
        ring.resize(3 * size_t(w));
        int32_t* rowL = ring.data();
        int32_t* Hp = rowL + w;   // H row k (prev/current)
        int32_t* Hn = Hp + w;     // H row k+1 (lookahead, p==1 only)
        auto synthL = [&](int k, int32_t* o) {
            inv53_row(cur.data() + size_t(k) * wl, HL + size_t(k) * wh, o,
                      w, px_);
        };
        auto synthH = [&](int k, int32_t* o) {
            inv53_row(LH + size_t(k) * wl, HH + size_t(k) * wh, o, w, px_);
        };
        if (hh == 0) {            // single L row (h == 1, even parity)
            for (int k = 0; k < hl; k++) synthL(k, dst + size_t(k) * w);
        } else if (hl == 0) {     // single H row (h == 1, odd parity)
            synthH(0, Hp);
            for (int x = 0; x < w; x++) dst[x] = Hp[x] >> 1;
        } else if (!py[lev]) {
            synthH(0, Hp);
            synthL(0, rowL);
            int32_t* Eprev = dst;  // E_0 at dst row 0
            for (int x = 0; x < w; x++)
                Eprev[x] = rowL[x] - ((2 * Hp[x] + 2) >> 2);
            for (int k = 1; k < hl; k++) {
                int32_t* Hk = Hp;
                if (k < hh) {
                    synthH(k, Hn);
                    Hk = Hn;
                }  // else clamp: H_k := H_{hh-1} (== Hp)
                synthL(k, rowL);
                int32_t* Ek = dst + size_t(2 * k) * w;
                for (int x = 0; x < w; x++)
                    Ek[x] = rowL[x] - ((Hp[x] + Hk[x] + 2) >> 2);
                int32_t* O = dst + size_t(2 * k - 1) * w;  // O_{k-1}
                for (int x = 0; x < w; x++)
                    O[x] = Hp[x] + ((Eprev[x] + Ek[x]) >> 1);
                if (k < hh) std::swap(Hp, Hn);
                Eprev = Ek;
            }
            if (hh == hl) {  // O_{hh-1}: er clamps to E_{hl-1}
                int32_t* O = dst + size_t(2 * hh - 1) * w;
                for (int x = 0; x < w; x++)
                    O[x] = Hp[x] + ((Eprev[x] + Eprev[x]) >> 1);
            }
        } else {
            // odd start parity: low rows at local odd slots, E_k needs a
            // one-row H lookahead
            synthH(0, Hp);
            int32_t* Eprev = nullptr;
            for (int k = 0; k < hl; k++) {
                int32_t* Hnx = Hp;
                if (k + 1 < hh) {
                    synthH(k + 1, Hn);
                    Hnx = Hn;
                }  // else clamp: H_{k+1} := H_{hh-1}
                synthL(k, rowL);
                int32_t* Ek = dst + size_t(2 * k + 1) * w;
                for (int x = 0; x < w; x++)
                    Ek[x] = rowL[x] - ((Hp[x] + Hnx[x] + 2) >> 2);
                int32_t* O = dst + size_t(2 * k) * w;  // O_k (ll: E_{k-1})
                const int32_t* ll = Eprev ? Eprev : Ek;
                for (int x = 0; x < w; x++)
                    O[x] = Hp[x] + ((ll[x] + Ek[x]) >> 1);
                if (k + 1 < hh) std::swap(Hp, Hn);
                Eprev = Ek;
            }
            if (hh > hl) {  // trailing high row O_{hl}: both clamps E_{hl-1}
                int32_t* O = dst + size_t(2 * hl) * w;
                for (int x = 0; x < w; x++)
                    O[x] = Hp[x] + ((Eprev[x] + Eprev[x]) >> 1);
            }
        }
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
