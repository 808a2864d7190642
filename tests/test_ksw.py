"""Kernel oracle tests: the row-vectorized reference kernels in
tpubwa.ref.ksw vs independent cell-by-cell transliterations and
brute-force DPs (SURVEY.md §4 item 3)."""
import numpy as np
import pytest

from tpubwa.opts import MemOpt
from tpubwa.ref.ksw import KswExt, ksw_align, ksw_extend, ksw_global


def scalar_extend(qlen, query, tlen, target, mat, o_del, e_del, o_ins,
                  e_ins, w, end_bonus, zdrop, h0):
    """Direct cell-by-cell transliteration of ksw.c:ksw_extend2."""
    assert h0 > 0
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    eh_h = [0] * (qlen + 1)
    eh_e = [0] * (qlen + 1)
    eh_h[0] = h0
    if qlen >= 1:
        eh_h[1] = h0 - oe_ins if h0 > oe_ins else 0
        j = 2
        while j <= qlen and eh_h[j - 1] > e_ins:
            eh_h[j] = eh_h[j - 1] - e_ins
            j += 1
    mmax = max(0, int(np.max(mat)))
    max_ins = max(int((qlen * mmax + end_bonus - o_ins) / e_ins + 1.0), 1)
    max_del = max(int((qlen * mmax + end_bonus - o_del) / e_del + 1.0), 1)
    w = min(w, max_ins, max_del)
    best, max_i, max_j, max_ie, gscore, max_off = h0, -1, -1, -1, -1, 0
    beg, end = 0, qlen
    for i in range(tlen):
        f, m, mj = 0, 0, -1
        if beg < i - w:
            beg = i - w
        if end > i + w + 1:
            end = i + w + 1
        if end > qlen:
            end = qlen
        if beg == 0:
            h1 = h0 - (o_del + e_del * (i + 1))
            if h1 < 0:
                h1 = 0
        else:
            h1 = 0
        j = beg
        for j in range(beg, end):
            M, e = eh_h[j], eh_e[j]
            eh_h[j] = h1
            M = M + int(mat[target[i], query[j]]) if M else 0
            h = M if M > e else e
            h = h if h > f else f
            h1 = h
            mj = mj if m > h else j
            m = m if m > h else h
            t = M - oe_del
            t = t if t > 0 else 0
            e -= e_del
            e = e if e > t else t
            eh_e[j] = e
            t = M - oe_ins
            t = t if t > 0 else 0
            f -= e_ins
            f = f if f > t else t
        j = end
        eh_h[end] = h1
        eh_e[end] = 0
        if j == qlen:
            max_ie = max_ie if gscore > h1 else i
            gscore = gscore if gscore > h1 else h1
        if m == 0:
            break
        if m > best:
            best, max_i, max_j = m, i, mj
            max_off = max(max_off, abs(mj - i))
        elif zdrop > 0:
            if i - max_i > mj - max_j:
                if best - m - ((i - max_i) - (mj - max_j)) * e_del > zdrop:
                    break
            else:
                if best - m - ((mj - max_j) - (i - max_i)) * e_ins > zdrop:
                    break
        j = beg
        while j < end and eh_h[j] == 0 and eh_e[j] == 0:
            j += 1
        beg = j
        j = end
        while j >= beg and eh_h[j] == 0 and eh_e[j] == 0:
            j -= 1
        end = min(j + 2, qlen)
    return KswExt(best, max_j + 1, max_i + 1, max_ie + 1, gscore, max_off)


def _mutate(rng, seq, n_mut, n_indel):
    s = list(seq)
    for _ in range(n_mut):
        p = int(rng.integers(0, len(s)))
        s[p] = int(rng.integers(0, 4))
    for _ in range(n_indel):
        p = int(rng.integers(1, len(s)))
        if rng.random() < 0.5:
            del s[p:p + int(rng.integers(1, 4))]
        else:
            s[p:p] = [int(rng.integers(0, 4))
                      for _ in range(int(rng.integers(1, 4)))]
    return np.array(s, dtype=np.uint8)


@pytest.mark.parametrize("trial", range(40))
def test_extend_matches_scalar_transliteration(trial):
    rng = np.random.default_rng(100 + trial)
    opt = MemOpt()
    mat = opt.scoring_matrix()
    tl = int(rng.integers(5, 120))
    target = rng.integers(0, 4, tl).astype(np.uint8)
    # query = mutated copy of a window of target (realistic extension job)
    ql = int(rng.integers(5, min(tl + 20, 110)))
    base = target[:min(ql, tl)]
    query = _mutate(rng, base, int(rng.integers(0, 4)), int(rng.integers(0, 3)))
    query = query[:110]
    ql = len(query)
    if ql == 0:
        return
    w = int(rng.choice([3, 10, 100]))
    zdrop = int(rng.choice([0, 10, 100]))
    h0 = int(rng.integers(1, 40))
    a = ksw_extend(ql, query, tl, target, mat, opt.o_del, opt.e_del,
                   opt.o_ins, opt.e_ins, w, opt.pen_clip5, zdrop, h0)
    b = scalar_extend(ql, query, tl, target, mat, opt.o_del, opt.e_del,
                      opt.o_ins, opt.e_ins, w, opt.pen_clip5, zdrop, h0)
    assert a == b, (trial, a, b)


@pytest.mark.parametrize("trial", range(20))
def test_extend_random_params(trial):
    rng = np.random.default_rng(300 + trial)
    m = np.full((5, 5), -int(rng.integers(1, 6)), dtype=np.int8)
    np.fill_diagonal(m, int(rng.integers(1, 4)))
    m[4, :] = -1
    m[:, 4] = -1
    ql, tl = int(rng.integers(1, 60)), int(rng.integers(1, 80))
    query = rng.integers(0, 4, ql).astype(np.uint8)
    target = rng.integers(0, 4, tl).astype(np.uint8)
    o_del, e_del = int(rng.integers(1, 8)), int(rng.integers(1, 4))
    o_ins, e_ins = int(rng.integers(1, 8)), int(rng.integers(1, 4))
    w = int(rng.integers(1, 30))
    zdrop = int(rng.choice([0, 5, 50]))
    h0 = int(rng.integers(1, 60))
    args = (ql, query, tl, target, m, o_del, e_del, o_ins, e_ins, w, 5,
            zdrop, h0)
    assert ksw_extend(*args) == scalar_extend(*args), trial


# ------------------------- local SW (ksw_align) -------------------------

def brute_local(query, target, mat, o_del, e_del, o_ins, e_ins):
    """Full-matrix local SW, gaps open from H (ksw_u8 recurrence)."""
    ql, tl = len(query), len(target)
    H = np.zeros((tl + 1, ql + 1), dtype=np.int64)
    E = np.zeros((tl + 1, ql + 1), dtype=np.int64)  # E[i][j]: gap in query
    F = np.zeros((tl + 1, ql + 1), dtype=np.int64)
    best, te, qe = 0, -1, -1
    for i in range(1, tl + 1):
        for j in range(1, ql + 1):
            E[i][j] = max(E[i - 1][j] - e_del,
                          H[i - 1][j] - o_del - e_del, 0)
            F[i][j] = max(F[i][j - 1] - e_ins,
                          H[i][j - 1] - o_ins - e_ins, 0)
            s = int(mat[target[i - 1], query[j - 1]])
            H[i][j] = max(0, H[i - 1][j - 1] + s, E[i][j], F[i][j])
        cm = H[i].max()
        if cm > best:
            best = int(cm)
            te = i - 1
            qe = int(np.argmax(H[i])) - 1
    return best, te, qe


@pytest.mark.parametrize("trial", range(15))
def test_align_matches_brute_force(trial):
    rng = np.random.default_rng(500 + trial)
    opt = MemOpt()
    mat = opt.scoring_matrix()
    tl = int(rng.integers(10, 80))
    target = rng.integers(0, 4, tl).astype(np.uint8)
    ql = int(rng.integers(5, 40))
    start = int(rng.integers(0, max(1, tl - ql)))
    query = _mutate(rng, target[start:start + ql], 2, 1)
    ql = len(query)
    if ql == 0:
        return
    r = ksw_align(ql, query, tl, target, mat, opt.o_del, opt.e_del,
                  opt.o_ins, opt.e_ins)
    b_score, b_te, b_qe = brute_local(query, target, mat, opt.o_del,
                                      opt.e_del, opt.o_ins, opt.e_ins)
    assert r.score == b_score
    if b_score > 0:
        assert r.te == b_te and r.qe == b_qe
        # start coords: alignment of query[qb:qe+1] vs target[tb:te+1]
        # must reproduce the full score
        s2, t2, q2 = brute_local(query[r.qb:r.qe + 1],
                                 target[r.tb:r.te + 1], mat, opt.o_del,
                                 opt.e_del, opt.o_ins, opt.e_ins)
        assert s2 == r.score


# ------------------------- global (ksw_global) --------------------------

def rescore_cigar(query, target, mat, o_del, e_del, o_ins, e_ins, cigar):
    qi = ti = 0
    s = 0
    for op, ln in cigar:
        if op == 0:
            for k in range(ln):
                s += int(mat[target[ti + k], query[qi + k]])
            qi += ln
            ti += ln
        elif op == 1:
            s -= o_ins + e_ins * ln
            qi += ln
        elif op == 2:
            s -= o_del + e_del * ln
            ti += ln
    assert qi == len(query) and ti == len(target)
    return s


@pytest.mark.parametrize("trial", range(20))
def test_global_cigar_consistent(trial):
    rng = np.random.default_rng(700 + trial)
    opt = MemOpt()
    mat = opt.scoring_matrix()
    tl = int(rng.integers(5, 60))
    target = rng.integers(0, 4, tl).astype(np.uint8)
    query = _mutate(rng, target, int(rng.integers(0, 5)),
                    int(rng.integers(0, 3)))
    ql = len(query)
    if ql == 0:
        return
    w = max(abs(ql - tl) + 3, int(rng.integers(5, 20)))
    score, cigar = ksw_global(ql, query, tl, target, mat, opt.o_del,
                              opt.e_del, opt.o_ins, opt.e_ins, w)
    # CIGAR must consume both sequences fully and re-score to the DP score
    assert score > -0x40000000
    assert rescore_cigar(query, target, mat, opt.o_del, opt.e_del,
                         opt.o_ins, opt.e_ins, cigar) == score
    # and the score must be optimal among single-gap-block alignments we
    # can enumerate cheaply for small cases (upper-bounded by match-count)
    if ql == tl:
        diag = sum(int(mat[t, q]) for t, q in zip(target, query))
        assert score >= diag


def test_global_identical_sequences():
    opt = MemOpt()
    mat = opt.scoring_matrix()
    q = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.uint8)
    score, cigar = ksw_global(8, q, 8, q, mat, opt.o_del, opt.e_del,
                              opt.o_ins, opt.e_ins, 5)
    assert score == 8 * opt.a
    assert cigar == [(0, 8)]


def test_extend_perfect_match_gscore():
    opt = MemOpt()
    mat = opt.scoring_matrix()
    t = np.array([0, 1, 2, 3] * 10, np.uint8)
    q = t[:20].copy()
    r = ksw_extend(20, q, 40, t, mat, opt.o_del, opt.e_del, opt.o_ins,
                   opt.e_ins, opt.w, opt.pen_clip5, opt.zdrop, h0=10)
    # extending a perfect prefix: best local = h0 + 20 matches
    assert r.score == 10 + 20
    assert r.qle == 20
    assert r.gscore == 10 + 20  # reaches query end with same score
