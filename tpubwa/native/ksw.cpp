// Scalar banded affine-gap SW kernels — native fast path for the host
// pipeline (semantics are pinned 1:1 to tpubwa/ref/ksw.py, which is the
// bit-faithful reference of upstream ksw.c:ksw_extend2/ksw_global2/
// ksw_align2; fuzz-tested against it in tests/test_ksw_native.py).
//
// These run on the HOST: ksw_global produces the CIGAR for each final
// alignment (1-2 calls/read), ksw_extend/ksw_align back the oversize /
// non-scmat fallbacks and mate rescue.  The NumPy versions cost
// milliseconds per call; these cost microseconds.

#include <cstdint>
#include <cstdlib>
#include <vector>

namespace {

inline int32_t imax(int32_t a, int32_t b) { return a > b ? a : b; }
inline int32_t imin(int32_t a, int32_t b) { return a < b ? a : b; }

const int32_t MINUS_INF = -0x40000000;

void push_cigar(int32_t* cig, int32_t cap, int32_t* n, int32_t op,
                int32_t len) {
    if (*n > 0 && cig[(*n - 1) * 2] == op) {
        cig[(*n - 1) * 2 + 1] += len;
    } else if (*n < cap) {
        cig[*n * 2] = op;
        cig[*n * 2 + 1] = len;
        ++*n;
    }
}

}  // namespace

extern "C" {

// returns 0 on success; -1 if the cigar buffer is too small
int tpubwa_ksw_global(int32_t qlen, const uint8_t* query, int32_t tlen,
                      const uint8_t* target, int32_t m,
                      const int32_t* mat, int32_t o_del, int32_t e_del,
                      int32_t o_ins, int32_t e_ins, int32_t w,
                      int32_t want_cigar, int32_t* score_out,
                      int32_t* cigar_out, int32_t cigar_cap,
                      int32_t* n_cigar_out) {
    int32_t n_cig = 0;
    if (qlen == 0 || tlen == 0) {
        int32_t score = 0;
        if (tlen) {
            push_cigar(cigar_out, cigar_cap, &n_cig, 2, tlen);
            score = -(o_del + e_del * tlen);
        }
        if (qlen) {
            push_cigar(cigar_out, cigar_cap, &n_cig, 1, qlen);
            score = -(o_ins + e_ins * qlen);
        }
        *score_out = score;
        *n_cigar_out = n_cig;
        return 0;
    }
    const int32_t oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
    const int64_t n_col = imin(qlen, 2 * w + 1);
    std::vector<uint8_t> z;
    if (want_cigar) z.resize((size_t)tlen * n_col);
    std::vector<int32_t> eh_h(qlen + 1, MINUS_INF),
        eh_e(qlen + 1, MINUS_INF);
    eh_h[0] = 0;
    for (int32_t j = 1; j <= imin(qlen, w); ++j)
        eh_h[j] = -(o_ins + e_ins * j);
    for (int32_t i = 0; i < tlen; ++i) {
        int32_t f = MINUS_INF;
        const int32_t beg = imax(i - w, 0);
        const int32_t end = imin(i + w + 1, qlen);
        int32_t h1 = beg == 0 ? -(o_del + e_del * (i + 1)) : MINUS_INF;
        const int32_t* q = mat + (int32_t)target[i] * m;
        uint8_t* zi = want_cigar ? z.data() + (size_t)i * n_col : nullptr;
        for (int32_t j = beg; j < end; ++j) {
            int32_t mm = eh_h[j];
            int32_t e = eh_e[j];
            eh_h[j] = h1;
            mm += q[query[j]];
            uint8_t d = mm >= e ? 0 : 1;
            int32_t h = mm >= e ? mm : e;
            d = h >= f ? d : 2;
            h = h >= f ? h : f;
            h1 = h;
            int32_t t = mm - oe_del;
            e -= e_del;
            if (e > t) d |= 1 << 2; else e = t;
            eh_e[j] = e;
            t = mm - oe_ins;
            f -= e_ins;
            if (f > t) d |= 2 << 4; else f = t;
            if (want_cigar) zi[j - beg] = d;
        }
        eh_h[end] = h1;
        eh_e[end] = MINUS_INF;
    }
    *score_out = eh_h[qlen];
    if (want_cigar) {
        // traceback (reversed run-length pushes, flipped at the end)
        std::vector<int32_t> rev((size_t)(qlen + tlen + 2) * 2);
        int32_t nr = 0;
        int32_t which = 0, i = tlen - 1, k = imin(i + w + 1, qlen) - 1;
        while (i >= 0 && k >= 0) {
            const uint8_t d = z[(size_t)i * n_col + (k - imax(i - w, 0))];
            which = (d >> (which << 1)) & 3;
            if (which == 0) {
                push_cigar(rev.data(), qlen + tlen + 2, &nr, 0, 1);
                --i; --k;
            } else if (which == 1) {
                push_cigar(rev.data(), qlen + tlen + 2, &nr, 2, 1);
                --i;
            } else {
                push_cigar(rev.data(), qlen + tlen + 2, &nr, 1, 1);
                --k;
            }
        }
        if (i >= 0) push_cigar(rev.data(), qlen + tlen + 2, &nr, 2, i + 1);
        if (k >= 0) push_cigar(rev.data(), qlen + tlen + 2, &nr, 1, k + 1);
        if (nr > cigar_cap) return -1;
        for (int32_t r = 0; r < nr; ++r) {
            cigar_out[r * 2] = rev[(nr - 1 - r) * 2];
            cigar_out[r * 2 + 1] = rev[(nr - 1 - r) * 2 + 1];
        }
        n_cig = nr;
    }
    *n_cigar_out = n_cig;
    return 0;
}

// out6 = {score, qle, tle, gtle, gscore, max_off}
void tpubwa_ksw_extend(int32_t qlen, const uint8_t* query, int32_t tlen,
                       const uint8_t* target, int32_t m,
                       const int32_t* mat, int32_t o_del, int32_t e_del,
                       int32_t o_ins, int32_t e_ins, int32_t w,
                       int32_t end_bonus, int32_t zdrop, int32_t h0,
                       int32_t* out6) {
    const int32_t oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
    std::vector<int32_t> eh_h(qlen + 2, 0), eh_e(qlen + 2, 0);
    eh_h[0] = h0;
    if (qlen >= 1) {
        eh_h[1] = h0 > oe_ins ? h0 - oe_ins : 0;
        for (int32_t j = 2; j <= qlen && eh_h[j - 1] > e_ins; ++j)
            eh_h[j] = eh_h[j - 1] - e_ins;
    }
    int32_t mmax = 0;
    for (int32_t i = 0; i < m * m; ++i) mmax = imax(mmax, mat[i]);
    int32_t max_ins = (int32_t)(((double)qlen * mmax + end_bonus - o_ins)
                                / e_ins + 1.0);
    w = imin(w, imax(max_ins, 1));
    int32_t max_del = (int32_t)(((double)qlen * mmax + end_bonus - o_del)
                                / e_del + 1.0);
    w = imin(w, imax(max_del, 1));

    int32_t best = h0, max_i = -1, max_j = -1, max_ie = -1, gscore = -1,
            max_off = 0, beg = 0, end = qlen;
    for (int32_t i = 0; i < tlen; ++i) {
        beg = imax(beg, i - w);
        end = imin(imin(end, i + w + 1), qlen);
        int32_t h1;
        if (beg == 0) {
            h1 = h0 - (o_del + e_del * (i + 1));
            if (h1 < 0) h1 = 0;
        } else {
            h1 = 0;
        }
        if (beg >= end) {
            eh_h[end] = h1;
            eh_e[end] = 0;
            if (end == qlen && h1 >= gscore) { max_ie = i; gscore = h1; }
            break;
        }
        const int32_t* q = mat + (int32_t)target[i] * m;
        int32_t f = 0, mrow = 0, mj = -1;
        for (int32_t j = beg; j < end; ++j) {
            // M = H(i-1,j-1) + score, 0 if H(i-1,j-1) == 0
            int32_t Hd = eh_h[j];
            int32_t M = Hd ? Hd + q[query[j]] : 0;
            int32_t e = eh_e[j];
            int32_t h = imax(M, e);
            h = imax(h, f);       // f = F(i, j)
            eh_h[j] = h1;         // H(i-1, j) for the next row's diag
            h1 = h;
            if (h >= mrow) { mrow = h; mj = j; }
            int32_t t = imax(M - oe_del, 0);
            e = imax(e - e_del, t);
            eh_e[j] = e;
            t = imax(M - oe_ins, 0);
            f = imax(f - e_ins, t);
        }
        eh_h[end] = h1;
        eh_e[end] = 0;
        if (end == qlen && h1 >= gscore) { max_ie = i; gscore = h1; }
        if (mrow == 0) break;
        if (mrow > best) {
            best = mrow; max_i = i; max_j = mj;
            max_off = imax(max_off, mj > i ? mj - i : i - mj);
        } else if (zdrop > 0) {
            if (i - max_i > mj - max_j) {
                if (best - mrow - ((i - max_i) - (mj - max_j)) * e_del
                        > zdrop)
                    break;
            } else {
                if (best - mrow - ((mj - max_j) - (i - max_i)) * e_ins
                        > zdrop)
                    break;
            }
        }
        // adaptive band trim on the shifted arrays
        int32_t nb = end;
        for (int32_t j = beg; j < end; ++j)
            if (eh_h[j] != 0 || eh_e[j] != 0) { nb = j; break; }
        beg = nb;
        int32_t j = end;
        while (j >= beg && eh_h[j] == 0 && eh_e[j] == 0) --j;
        end = imin(j + 2, qlen);
    }
    out6[0] = best; out6[1] = max_j + 1; out6[2] = max_i + 1;
    out6[3] = max_ie + 1; out6[4] = gscore; out6[5] = max_off;
}

namespace {

// local SW forward pass; col_max must hold tlen entries.
void local_forward(int32_t qlen, const uint8_t* query, int32_t tlen,
                   const uint8_t* target, int32_t m, const int32_t* mat,
                   int32_t o_del, int32_t e_del, int32_t o_ins,
                   int32_t e_ins, int32_t* best_out, int32_t* te_out,
                   int32_t* qe_out, int32_t* col_max) {
    const int32_t oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
    std::vector<int32_t> H(qlen + 1, 0), E(qlen, 0);
    int32_t best = 0, te = -1, qe = -1;
    for (int32_t i = 0; i < tlen; ++i) {
        const int32_t* q = mat + (int32_t)target[i] * m;
        int32_t f = 0, diag = 0, cm = 0, cj = -1;
        // H[j] holds H(i-1, j); diag tracks H(i-1, j-1)
        for (int32_t j = 0; j < qlen; ++j) {
            int32_t M = diag + q[query[j]];
            diag = H[j];
            int32_t he = imax(imax(M, E[j]), 0);
            // f here = F(i, j) computed from he (the scan closes over
            // he exactly; see ref/ksw.py:_local_forward)
            int32_t h = imax(he, f);
            E[j] = imax(imax(E[j] - e_del, h - oe_del), 0);
            H[j] = h;
            f = imax(f - e_ins, he - oe_ins);
            if (h > cm) { cm = h; cj = j; }
        }
        col_max[i] = cm;
        if (cm > best) { best = cm; te = i; qe = cj; }
    }
    *best_out = best; *te_out = te; *qe_out = qe;
}

}  // namespace

// out7 = {score, te, qe, score2, te2, tb, qb}
void tpubwa_ksw_align(int32_t qlen, const uint8_t* query, int32_t tlen,
                      const uint8_t* target, int32_t m,
                      const int32_t* mat, int32_t o_del, int32_t e_del,
                      int32_t o_ins, int32_t e_ins, int32_t minsc,
                      int32_t want_start, int32_t* out7) {
    std::vector<int32_t> col_max(tlen, 0);
    int32_t score, te, qe;
    local_forward(qlen, query, tlen, target, m, mat, o_del, e_del,
                  o_ins, e_ins, &score, &te, &qe, col_max.data());
    int32_t score2 = -1, te2 = -1;
    if (te >= 0) {
        const int32_t lo = te - qlen, hi = te + qlen;
        const int32_t floor2 = imax(minsc, 1);
        for (int32_t e = 0; e < tlen; ++e)
            if ((e < lo || e > hi) && col_max[e] >= floor2
                    && col_max[e] > score2) {
                score2 = col_max[e];
                te2 = e;
            }
    }
    out7[0] = score; out7[1] = te; out7[2] = qe;
    out7[3] = score2; out7[4] = te2; out7[5] = -1; out7[6] = -1;
    if (!want_start || score <= 0 || (minsc && score < minsc)) return;
    std::vector<uint8_t> rq(qe + 1), rt(te + 1);
    for (int32_t j = 0; j <= qe; ++j) rq[j] = query[qe - j];
    for (int32_t i = 0; i <= te; ++i) rt[i] = target[te - i];
    std::vector<int32_t> cm2(te + 1, 0);
    int32_t s2, rte, rqe;
    local_forward(qe + 1, rq.data(), te + 1, rt.data(), m, mat, o_del,
                  e_del, o_ins, e_ins, &s2, &rte, &rqe, cm2.data());
    out7[5] = te - rte;
    out7[6] = qe - rqe;
}

}  // extern "C"
