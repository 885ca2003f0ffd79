// JPEG 2000 Tier-1 (EBCOT) code-block decoder — native twin of the
// Python reference in nd_tpu/io/jp2.py (_MQDecoder/_T1Decoder).
//
// The Python decoder is the readable specification and stays the
// oracle; this C++ version exists because Tier-1 is the JP2 hot loop
// (a 10980x10980 Sentinel-2 band is ~29k code blocks of serial MQ
// decoding — Python-loop decode is minutes, this is seconds). The
// logic mirrors the Python line for line: same MQ state machine
// (Annex C), same context tables, same stripe-of-4 pass order, and
// the same per-coefficient last-updated-plane tracking the 9/7
// mid-bin reconstruction consumes. Parity is pinned bit-exactly in
// tests/test_jp2.py::test_native_t1_matches_python.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------
// MQ arithmetic decoder (ISO/IEC 15444-1 Annex C)
// ---------------------------------------------------------------

struct QeRow { uint32_t qe; uint8_t nmps, nlps, sw; };

static const QeRow QE[47] = {
    {0x5601, 1, 1, 1},  {0x3401, 2, 6, 0},   {0x1801, 3, 9, 0},
    {0x0AC1, 4, 12, 0}, {0x0521, 5, 29, 0},  {0x0221, 38, 33, 0},
    {0x5601, 7, 6, 1},  {0x5401, 8, 14, 0},  {0x4801, 9, 14, 0},
    {0x3801, 10, 14, 0},{0x3001, 11, 17, 0}, {0x2401, 12, 18, 0},
    {0x1C01, 13, 20, 0},{0x1601, 29, 21, 0}, {0x5601, 15, 14, 1},
    {0x5401, 16, 14, 0},{0x5101, 17, 15, 0}, {0x4801, 18, 16, 0},
    {0x3801, 19, 17, 0},{0x3401, 20, 18, 0}, {0x3001, 21, 19, 0},
    {0x2801, 22, 19, 0},{0x2401, 23, 20, 0}, {0x2201, 24, 21, 0},
    {0x1C01, 25, 22, 0},{0x1801, 26, 23, 0}, {0x1601, 27, 24, 0},
    {0x1401, 28, 25, 0},{0x1201, 29, 26, 0}, {0x1101, 30, 27, 0},
    {0x0AC1, 31, 28, 0},{0x09C1, 32, 29, 0}, {0x08A1, 33, 30, 0},
    {0x0521, 34, 31, 0},{0x0441, 35, 32, 0}, {0x02A1, 36, 33, 0},
    {0x0221, 37, 34, 0},{0x0141, 38, 35, 0}, {0x0111, 39, 36, 0},
    {0x0085, 40, 37, 0},{0x0049, 41, 38, 0}, {0x0025, 42, 39, 0},
    {0x0015, 43, 40, 0},{0x0009, 44, 41, 0}, {0x0005, 45, 42, 0},
    {0x0001, 45, 43, 0},{0x5601, 46, 46, 0},
};

constexpr int N_CTX = 19;
constexpr int CTX_RL = 17;
constexpr int CTX_UNI = 18;

struct MQ {
    const uint8_t* data;
    int64_t n, bp;
    uint32_t c, a, ct;
    uint8_t cx_i[N_CTX];
    uint8_t cx_m[N_CTX];

    uint8_t byte_at(int64_t i) const {
        return i < n ? data[i] : 0xFF;
    }
    void bytein() {
        if (byte_at(bp) == 0xFF) {
            if (byte_at(bp + 1) > 0x8F) {
                c += 0xFF00;
                ct = 8;
            } else {
                bp += 1;
                c += (uint32_t)byte_at(bp) << 9;
                ct = 7;
            }
        } else {
            bp += 1;
            c += (uint32_t)byte_at(bp) << 8;
            ct = 8;
        }
    }
    void init(const uint8_t* d, int64_t len) {
        data = d;
        n = len;
        bp = 0;
        uint8_t b0 = len ? d[0] : 0xFF;
        c = (uint32_t)b0 << 16;
        bytein();
        c <<= 7;
        ct -= 7;
        a = 0x8000;
        std::memset(cx_i, 0, sizeof(cx_i));
        std::memset(cx_m, 0, sizeof(cx_m));
        cx_i[CTX_UNI] = 46;
        cx_i[CTX_RL] = 3;
        cx_i[0] = 4;
    }
    int decode(int ctx) {
        const QeRow& row = QE[cx_i[ctx]];
        const uint32_t qe = row.qe;
        int d;
        a -= qe;
        if ((c >> 16) < qe) {
            if (a < qe) {
                d = cx_m[ctx];
                cx_i[ctx] = row.nmps;
            } else {
                d = 1 - cx_m[ctx];
                if (row.sw) cx_m[ctx] = 1 - cx_m[ctx];
                cx_i[ctx] = row.nlps;
            }
            a = qe;
        } else {
            c -= qe << 16;
            if (a & 0x8000) return cx_m[ctx];
            if (a < qe) {
                d = 1 - cx_m[ctx];
                if (row.sw) cx_m[ctx] = 1 - cx_m[ctx];
                cx_i[ctx] = row.nlps;
            } else {
                d = cx_m[ctx];
                cx_i[ctx] = row.nmps;
            }
        }
        do {
            if (ct == 0) bytein();
            a <<= 1;
            c = (c << 1) & 0xFFFFFFFFu;
            ct -= 1;
        } while (!(a & 0x8000));
        return d;
    }
};

// significance context tables (same construction as _build_sig_tables)
struct SigTables {
    int8_t lh[3][3][5];
    int8_t hh[5][5];
    SigTables() {
        for (int h = 0; h < 3; h++)
            for (int v = 0; v < 3; v++)
                for (int d = 0; d < 5; d++) {
                    int cc;
                    if (h == 2) cc = 8;
                    else if (h == 1) cc = v >= 1 ? 7 : (d >= 1 ? 6 : 5);
                    else if (v == 2) cc = 4;
                    else if (v == 1) cc = 3;
                    else cc = d >= 2 ? 2 : (d == 1 ? 1 : 0);
                    lh[h][v][d] = (int8_t)cc;
                }
        for (int hv = 0; hv < 5; hv++)
            for (int d = 0; d < 5; d++) {
                int cc;
                if (d >= 3) cc = 8;
                else if (d == 2) cc = hv >= 1 ? 7 : 6;
                else if (d == 1) cc = hv >= 2 ? 5 : (hv == 1 ? 4 : 3);
                else cc = hv >= 2 ? 2 : (hv == 1 ? 1 : 0);
                hh[hv][d] = (int8_t)cc;
            }
    }
};
static const SigTables SIG;

// sign context/xor from clamped (H, V): ctx in 9..13
static inline void sign_ctx(int hc, int vc, int* ctx, int* xo) {
    static const int tab_ctx[3][3] = {   // [hc+1][vc+1]
        {13, 12, 11}, {10, 9, 10}, {11, 12, 13}};
    static const int tab_xo[3][3] = {
        {1, 1, 1}, {1, 0, 0}, {0, 0, 0}};
    *ctx = tab_ctx[hc + 1][vc + 1];
    *xo = tab_xo[hc + 1][vc + 1];
}

struct T1 {
    int64_t w, h, W;            // W = w + 2 (padded stride)
    int orient;                 // 0 LL, 1 HL, 2 LH, 3 HH
    std::vector<uint8_t> sig, visited, refined;
    std::vector<int8_t> sgn;
    std::vector<int64_t> mag;
    std::vector<int16_t> lastp;
    MQ mq;

    T1(int64_t w_, int64_t h_, int orient_)
        : w(w_), h(h_), W(w_ + 2), orient(orient_),
          sig((h_ + 2) * (w_ + 2), 0),
          visited((h_ + 2) * (w_ + 2), 0),
          refined((h_ + 2) * (w_ + 2), 0),
          sgn((h_ + 2) * (w_ + 2), 0),
          mag((h_ + 2) * (w_ + 2), 0),
          lastp((h_ + 2) * (w_ + 2), 0) {}

    inline int64_t at(int64_t y, int64_t x) const { return y * W + x; }

    int sig_ctx(int64_t y, int64_t x) const {
        const uint8_t* s = sig.data();
        int hs = s[at(y, x - 1)] + s[at(y, x + 1)];
        int vs = s[at(y - 1, x)] + s[at(y + 1, x)];
        int ds = s[at(y - 1, x - 1)] + s[at(y - 1, x + 1)]
               + s[at(y + 1, x - 1)] + s[at(y + 1, x + 1)];
        if (orient == 3) return SIG.hh[hs + vs][ds];
        if (orient == 1) { int t = hs; hs = vs; vs = t; }
        return SIG.lh[hs][vs][ds];
    }

    int decode_sign(int64_t y, int64_t x) {
        const uint8_t* s = sig.data();
        const int8_t* g = sgn.data();
        int hc = s[at(y, x - 1)] * g[at(y, x - 1)]
               + s[at(y, x + 1)] * g[at(y, x + 1)];
        int vc = s[at(y - 1, x)] * g[at(y - 1, x)]
               + s[at(y + 1, x)] * g[at(y + 1, x)];
        hc = hc > 1 ? 1 : (hc < -1 ? -1 : hc);
        vc = vc > 1 ? 1 : (vc < -1 ? -1 : vc);
        int ctx, xo;
        sign_ctx(hc, vc, &ctx, &xo);
        int bit = mq.decode(ctx);
        return (bit ^ xo) ? -1 : 1;
    }

    void sig_prop_pass(int bp) {
        const int64_t one = (int64_t)1 << bp;
        for (int64_t y0 = 1; y0 < h + 1; y0 += 4)
            for (int64_t x = 1; x < w + 1; x++)
                for (int64_t y = y0;
                     y < (y0 + 4 < h + 1 ? y0 + 4 : h + 1); y++) {
                    if (sig[at(y, x)]) continue;
                    int ctx = sig_ctx(y, x);
                    if (ctx == 0) continue;
                    visited[at(y, x)] = 1;
                    if (mq.decode(ctx)) {
                        sig[at(y, x)] = 1;
                        mag[at(y, x)] |= one;
                        lastp[at(y, x)] = (int16_t)bp;
                        sgn[at(y, x)] = (int8_t)decode_sign(y, x);
                    }
                }
    }

    void mag_ref_pass(int bp) {
        const int64_t one = (int64_t)1 << bp;
        for (int64_t y0 = 1; y0 < h + 1; y0 += 4)
            for (int64_t x = 1; x < w + 1; x++)
                for (int64_t y = y0;
                     y < (y0 + 4 < h + 1 ? y0 + 4 : h + 1); y++) {
                    if (!sig[at(y, x)] || visited[at(y, x)]) continue;
                    int ctx;
                    if (refined[at(y, x)]) ctx = 16;
                    else {
                        const uint8_t* s = sig.data();
                        int any_nb = s[at(y, x - 1)] + s[at(y, x + 1)]
                            + s[at(y - 1, x)] + s[at(y + 1, x)]
                            + s[at(y - 1, x - 1)] + s[at(y - 1, x + 1)]
                            + s[at(y + 1, x - 1)] + s[at(y + 1, x + 1)];
                        ctx = any_nb ? 15 : 14;
                    }
                    if (mq.decode(ctx)) mag[at(y, x)] |= one;
                    refined[at(y, x)] = 1;
                    lastp[at(y, x)] = (int16_t)bp;
                }
    }

    void cleanup_pass(int bp) {
        const int64_t one = (int64_t)1 << bp;
        for (int64_t y0 = 1; y0 < h + 1; y0 += 4) {
            bool full = (y0 + 3 <= h);
            for (int64_t x = 1; x < w + 1; x++) {
                int64_t y = y0;
                if (full) {
                    bool rl = true;
                    for (int k = 0; k < 4 && rl; k++)
                        if (sig[at(y0 + k, x)] || visited[at(y0 + k, x)])
                            rl = false;
                    if (rl)
                        for (int k = 0; k < 4 && rl; k++)
                            if (sig_ctx(y0 + k, x) != 0) rl = false;
                    if (rl) {
                        if (!mq.decode(CTX_RL)) continue;
                        int r = (mq.decode(CTX_UNI) << 1)
                              | mq.decode(CTX_UNI);
                        y = y0 + r;
                        sig[at(y, x)] = 1;
                        mag[at(y, x)] |= one;
                        lastp[at(y, x)] = (int16_t)bp;
                        sgn[at(y, x)] = (int8_t)decode_sign(y, x);
                        y += 1;
                    }
                }
                for (; y < (y0 + 4 < h + 1 ? y0 + 4 : h + 1); y++) {
                    if (!sig[at(y, x)] && !visited[at(y, x)]) {
                        if (mq.decode(sig_ctx(y, x))) {
                            sig[at(y, x)] = 1;
                            mag[at(y, x)] |= one;
                            lastp[at(y, x)] = (int16_t)bp;
                            sgn[at(y, x)] = (int8_t)decode_sign(y, x);
                        }
                    }
                }
            }
        }
        std::fill(visited.begin(), visited.end(), (uint8_t)0);
    }
};

}  // namespace

static int t1_decode_one(
    const uint8_t* data, int64_t nbytes,
    int64_t w, int64_t h, int orient,
    int64_t npasses, int64_t numbps,
    int64_t* out_vals, int16_t* out_lastp) {
    if (npasses == 0 || numbps <= 0) {
        std::memset(out_vals, 0, sizeof(int64_t) * w * h);
        std::memset(out_lastp, 0, sizeof(int16_t) * w * h);
        return 0;
    }
    T1 t1(w, h, orient);
    t1.mq.init(data, nbytes);
    int bp = (int)numbps - 1;
    int64_t passno = 0;
    int kind = 2;                       // first pass is a cleanup
    while (passno < npasses) {
        if (kind == 0) t1.sig_prop_pass(bp);
        else if (kind == 1) t1.mag_ref_pass(bp);
        else {
            t1.cleanup_pass(bp);
            bp -= 1;
            if (bp < 0 && passno + 1 < npasses)
                return 1;               // more passes than bit-planes
        }
        passno += 1;
        kind = (kind + 1) % 3;
    }
    for (int64_t y = 0; y < h; y++)
        for (int64_t x = 0; x < w; x++) {
            int64_t p = (y + 1) * t1.W + (x + 1);
            out_vals[y * w + x] = t1.mag[p] * t1.sgn[p];
            out_lastp[y * w + x] = t1.lastp[p];
        }
    return 0;
}

extern "C" int nd_jp2_t1_decode(
    const uint8_t* data, int64_t nbytes,
    int64_t w, int64_t h, int orient,
    int64_t npasses, int64_t numbps,
    int64_t* out_vals, int16_t* out_lastp) {
    return t1_decode_one(data, nbytes, w, h, orient, npasses,
                         numbps, out_vals, out_lastp);
}

// Batched decode: code-blocks are fully independent (each owns its MQ
// codeword segment and state planes), so a tile's blocks fan out over
// OpenMP threads. meta rows: (w, h, orient, npasses, numbps).
extern "C" int nd_jp2_t1_decode_batch(
    const uint8_t* data, const int64_t* offs,
    const int64_t* meta, int64_t nblocks,
    int64_t* out_vals, int16_t* out_lastp,
    const int64_t* out_offs, int nthreads) {
    int err = 0;
#pragma omp parallel for schedule(dynamic) num_threads(nthreads) \
    reduction(max : err)
    for (int64_t b = 0; b < nblocks; b++) {
        const int64_t* m = meta + 5 * b;
        int rc = t1_decode_one(
            data + offs[b], offs[b + 1] - offs[b],
            m[0], m[1], (int)m[2], m[3], m[4],
            out_vals + out_offs[b], out_lastp + out_offs[b]);
        if (rc > err) err = rc;
    }
    return err;
}
