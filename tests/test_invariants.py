"""Independent invariant tests that do NOT reuse ref/'s code paths
(VERDICT round-3 item 7).

The oracle chain (ref/ transcription -> native -> device) is
self-referential at its root: a transcription error present since
round 1 would pass every cross-implementation equality test AND the
frozen goldens.  Each test here checks a property that is derivable
WITHOUT trusting ref/ — brute-force substring counts on the raw text,
NM/MD re-derivation from the FASTA itself, mathematical monotonicity
of the MAPQ formula, direct quantile recomputation for pestat, strand
symmetry of the full aligner — so a frozen semantics error trips at
least one of them.

Upstream anchors (SURVEY.md provenance: bwt.c:~400 bwt_smem1a,
bwamem.c:~1040 mem_approx_mapq_se, bwamem_pair.c:~60 mem_pestat,
bwa.c:~120 bwa_gen_cigar2).
"""
import hashlib
import io
import os
import re

import numpy as np

from tpubwa.opts import MemOpt
from simread import simulate_pairs, simulate_reads, write_fastq

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "golden")
BASES = "ACGT"
CIG_RE = re.compile(r"(\d+)([MIDSH])")
COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


# ------------------------------------------------------------ helpers
def _count_occurrences(text_codes: np.ndarray, pat: np.ndarray) -> int:
    """Naive substring count over raw uint8 codes — no FM-index, no
    ref/ code.  bytes.count is non-overlapping, so scan manually."""
    t = text_codes.tobytes()
    p = pat.tobytes()
    n, i = 0, t.find(p)
    while i != -1:
        n += 1
        i = t.find(p, i + 1)
    return n


def _mem_index(tmp_path, codes, name="chr1"):
    from tpubwa.cli import main_index
    bases = "".join(BASES[c] for c in codes)
    fa = tmp_path / "inv_ref.fa"
    fa.write_text(f">{name} t\n" + "\n".join(
        bases[i:i + 70] for i in range(0, len(bases), 70)) + "\n")
    assert main_index([str(fa)]) == 0
    return str(fa)


def _run_mem(prefix, fqs, extra=None):
    from tpubwa.cli import main_mem
    out = io.StringIO()
    assert main_mem(["--device", "scalar"] + (extra or [])
                    + [prefix] + fqs, out=out) == 0
    recs = [l.split("\t") for l in out.getvalue().splitlines()
            if l and not l.startswith("@")]
    return recs


# ------------------------------------------- 1. SMEM supermaximality
def test_smem_supermaximality_by_substring_search():
    """Every SMEM emitted by the production seeding must (a) occur in
    the doubled text exactly `size` times and (b) be one-base
    UNextendable: query[qb-1:qe] and query[qb:qe+1] must have ZERO
    occurrences (else a longer exact match through the same position
    exists and the emitted interval is not supermaximal).  Checked by
    naive byte search on the raw doubled text — no FM-index involved."""
    from tpubwa.index.build import BntSeq, SeqAnn
    from tpubwa.index.fmindex import FMIndex
    from tpubwa.ref.smem import smem1a
    rng = np.random.default_rng(0xA11)
    unit = rng.integers(0, 4, 23).astype(np.uint8)
    codes = np.concatenate([rng.integers(0, 4, 3000).astype(np.uint8),
                            np.tile(unit, 6),
                            rng.integers(0, 4, 400).astype(np.uint8)])
    bnt = BntSeq(l_pac=len(codes),
                 anns=[SeqAnn(name="t", anno="", offset=0,
                              length=len(codes), n_ambs=0)],
                 ambs=[], seed=11, codes=codes)
    fmi = FMIndex.build(bnt)
    text = bnt.doubled()
    checked = 0
    for trial in range(10):
        start = int(rng.integers(0, len(codes) - 90))
        q = codes[start:start + 80].copy()
        for _ in range(int(rng.integers(0, 4))):
            q[int(rng.integers(0, 80))] = int(rng.integers(0, 4))
        x, tmp = 0, []
        while x < len(q):
            x = smem1a(fmi, q, x, 1, 0, tmp)
            for m in tmp:
                pat = q[m.qb:m.qe]
                assert _count_occurrences(text, pat) == m.size, \
                    (trial, m.qb, m.qe)
                if m.qb > 0:
                    assert _count_occurrences(text, q[m.qb - 1:m.qe]) \
                        == 0, (trial, "left-extendable", m.qb, m.qe)
                if m.qe < len(q):
                    assert _count_occurrences(text, q[m.qb:m.qe + 1]) \
                        == 0, (trial, "right-extendable", m.qb, m.qe)
                checked += 1
    assert checked > 40


# ------------------------------- 2. seed positions land on real text
def test_seed_positions_match_raw_text():
    """collect_intv + sa_positions: every reported (rbeg, qb, qe) must
    satisfy doubled_text[rbeg : rbeg+(qe-qb)] == query[qb:qe], checked
    on the raw codes array.  Catches any SA-walk / occ / coordinate
    transcription error in one shot."""
    from tpubwa.index.build import BntSeq, SeqAnn
    from tpubwa.index.fmindex import FMIndex
    from tpubwa.ref.smem import collect_intv, sa_positions
    rng = np.random.default_rng(0xB22)
    codes = rng.integers(0, 4, 6000).astype(np.uint8)
    bnt = BntSeq(l_pac=len(codes),
                 anns=[SeqAnn(name="t", anno="", offset=0,
                              length=len(codes), n_ambs=0)],
                 ambs=[], seed=11, codes=codes)
    fmi = FMIndex.build(bnt)
    text = bnt.doubled()
    opt = MemOpt()
    n_pos = 0
    for trial in range(8):
        start = int(rng.integers(0, len(codes) - 120))
        q = codes[start:start + 100].copy()
        q[int(rng.integers(0, 100))] = int(rng.integers(0, 4))
        for m in collect_intv(opt, fmi, q):
            for rbeg, _rank in sa_positions(fmi, m, opt.max_occ):
                ln = m.qe - m.qb
                assert np.array_equal(text[rbeg:rbeg + ln],
                                      q[m.qb:m.qe]), (trial, rbeg)
                n_pos += 1
    assert n_pos > 20


# --------------------------------- 3. NM/CIGAR re-derived from FASTA
def _parse_fasta_codes(path):
    seqs = {}
    name, parts = None, []
    for line in open(path):
        if line.startswith(">"):
            if name:
                seqs[name] = "".join(parts)
            name, parts = line[1:].split()[0], []
        else:
            parts.append(line.strip())
    if name:
        seqs[name] = "".join(parts)
    return seqs


def _recount_nm(ref_seq, pos0, cigar, seq):
    """Walk the CIGAR against the FASTA text and the SAM SEQ column,
    counting mismatches + inserted + deleted bases (samtools calmd
    definition of NM).  Returns (nm, ref_consumed) or None if the
    record walks off the contig."""
    nm, ri, qi = 0, pos0, 0
    for n_str, op in CIG_RE.findall(cigar):
        n = int(n_str)
        if op == "M":
            if ri + n > len(ref_seq):
                return None
            for k in range(n):
                if seq[qi + k] != ref_seq[ri + k]:
                    nm += 1
            ri += n
            qi += n
        elif op == "I":
            nm += n
            qi += n
        elif op == "D":
            nm += n
            ri += n
        elif op == "S":
            qi += n
        # H consumes nothing
    return nm, ri - pos0


def test_sam_nm_cigar_consistent_with_fasta(tmp_path):
    """Every aligned record's NM tag must equal the edit count
    re-derived by walking its CIGAR against the ORIGINAL FASTA text
    (not pac / not gen_cigar).  A transcription error in the CIGAR
    generator, depos folding, or NM computation breaks this even if
    every implementation agrees with every other one."""
    rng = np.random.default_rng(0xC33)
    codes = rng.integers(0, 4, 24000).astype(np.uint8)
    fa = _mem_index(tmp_path, codes)
    prefix = fa
    ref_seq = _parse_fasta_codes(fa)["chr1"]
    reads = simulate_reads(codes, 80, 100, rng, snp_rate=0.02,
                           indel_rate=0.01)
    fq = str(tmp_path / "inv.fq")
    write_fastq(fq, reads)
    recs = _run_mem(prefix, [fq])
    n_checked = 0
    for r in recs:
        flag = int(r[1])
        if flag & 0x4:
            continue
        pos0 = int(r[3]) - 1
        tags = {t.split(":", 1)[0]: t.split(":", 2)[2] for t in r[11:]}
        assert "NM" in tags, r[0]
        seq = r[9]  # SEQ column is already revcomped by the aligner
        got = _recount_nm(ref_seq, pos0, r[5], seq)
        assert got is not None, (r[0], "walked off contig")
        nm, rlen = got
        assert nm == int(tags["NM"]), (r[0], r[5], nm, tags["NM"])
        assert pos0 + rlen <= len(ref_seq)
        n_checked += 1
    assert n_checked >= 60


def test_sam_md_consistent_with_fasta(tmp_path):
    """MD tag re-derivation: reconstruct the reference bases under the
    alignment from MD + SEQ and compare with the FASTA text directly
    (samtools-calmd semantics)."""
    rng = np.random.default_rng(0xD44)
    codes = rng.integers(0, 4, 20000).astype(np.uint8)
    fa = _mem_index(tmp_path, codes)
    prefix = str(tmp_path / "inv_ref.fa")
    ref_seq = _parse_fasta_codes(fa)["chr1"]
    reads = simulate_reads(codes, 60, 100, rng, snp_rate=0.03,
                           indel_rate=0.008)
    fq = str(tmp_path / "inv.fq")
    write_fastq(fq, reads)
    recs = _run_mem(prefix, [fq])
    md_re = re.compile(r"(\d+)|(\^[A-Z]+)|([A-Z])")
    n_checked = 0
    for r in recs:
        flag = int(r[1])
        if flag & 0x4:
            continue
        tags = {t.split(":", 1)[0]: t.split(":", 2)[2] for t in r[11:]}
        if "MD" not in tags:
            continue
        pos0 = int(r[3]) - 1
        # rebuild the reference segment from SEQ + CIGAR + MD
        seq, cig = r[9], r[5]
        aligned = []          # query bases consumed by M ops, in order
        qi = 0
        for n_str, op in CIG_RE.findall(cig):
            n = int(n_str)
            if op == "M":
                aligned.append((qi, n, False))
                qi += n
            elif op == "I" or op == "S":
                qi += n
            # D consumes reference only; MD carries the deleted bases
        m_bases = "".join(seq[q0:q0 + n] for q0, n, _ in aligned)
        rebuilt, mi = [], 0
        for tok in md_re.finditer(tags["MD"]):
            if tok.group(1):          # run of matches
                n = int(tok.group(1))
                rebuilt.append(m_bases[mi:mi + n])
                mi += n
            elif tok.group(2):        # deletion: ref bases follow ^
                rebuilt.append(tok.group(2)[1:])
            else:                     # mismatch: MD names the ref base
                rebuilt.append(tok.group(3))
                mi += 1
        ref_from_md = "".join(rebuilt)
        rlen = sum(int(n) for n, op in CIG_RE.findall(cig)
                   if op in "MD")
        assert ref_from_md == ref_seq[pos0:pos0 + rlen], r[0]
        n_checked += 1
    assert n_checked >= 50


# ------------------------------------------- 4. MAPQ as a FUNCTION
def test_mapq_monotonicity_and_bounds():
    """Mathematical properties of mem_approx_mapq_se that hold for the
    genuine formula and break under typical transcription slips
    (swapped a/b, missing sub_n damping, inverted frac_rep):
      - 0 <= mapq <= 60 everywhere;
      - mapq == 0 whenever sub >= score;
      - non-decreasing in score (other fields fixed);
      - non-increasing in sub, sub_n and frac_rep;
      - frac_rep=1 forces 0."""
    from tpubwa.host.regions import AlnReg, approx_mapq
    opt = MemOpt()

    def reg(score, sub=0, csub=0, sub_n=0, frac_rep=0.0, l=100):
        return AlnReg(rb=0, re=l, qb=0, qe=l, rid=0, score=score,
                      sub=sub, csub=csub, sub_n=sub_n,
                      frac_rep=frac_rep, seedcov=l)

    rng = np.random.default_rng(0xE55)
    for _ in range(400):
        score = int(rng.integers(0, 120))
        sub = int(rng.integers(0, 120))
        csub = int(rng.integers(0, 120))
        sub_n = int(rng.integers(0, 6))
        fr = float(rng.random())
        l = int(rng.integers(30, 151))
        q = approx_mapq(opt, reg(score, sub, csub, sub_n, fr, l))
        assert 0 <= q <= 60
        if max(sub if sub else opt.min_seed_len * opt.a, csub) >= score:
            assert q == 0
        assert approx_mapq(opt, reg(score, sub, csub, sub_n, 1.0, l)) \
            == 0
    for l in (50, 100, 150):
        prev = -1
        for score in range(0, l + 1, 5):
            q = approx_mapq(opt, reg(score, sub=20, l=l))
            assert q >= prev, (l, score)
            prev = q
        prev = 61
        for sub in range(0, 101, 5):
            q = approx_mapq(opt, reg(100, sub=sub, l=l))
            assert q <= prev, (l, sub)
            prev = q
        prev = 61
        for sub_n in range(0, 8):
            q = approx_mapq(opt, reg(100, sub=30, sub_n=sub_n, l=l))
            assert q <= prev
            prev = q
        prev = 61
        for fr10 in range(0, 11):
            q = approx_mapq(opt, reg(100, sub=30, frac_rep=fr10 / 10,
                                     l=l))
            assert q <= prev
            prev = q


# --------------------------------- 5. pestat vs direct recomputation
def test_pestat_vs_direct_quantile_recomputation():
    """Feed pestat synthetic FR regions with KNOWN insert sizes and
    recompute the bounds directly from the raw insert list with
    independently-written quantile/trim code (spec: bwamem_pair.c:~60).
    Also: the inferred [low, high] must bracket >= 95% of the true
    inserts for a clean unimodal sample — a sanity property that fails
    if quartiles/bounds are mis-transcribed."""
    from tpubwa.host.pair import pestat
    from tpubwa.host.regions import AlnReg
    opt = MemOpt()
    l_pac = 10_000_000
    rng = np.random.default_rng(0xF66)
    inserts = np.clip(rng.normal(400, 40, 600).astype(int), 120, 900)
    all_regs = []
    for ins in inserts:
        p = int(rng.integers(0, l_pac - 1000))
        # FR pair: R1 forward at p, R2 reverse; reverse-strand rb is
        # folded into [l_pac, 2*l_pac)
        fwd = AlnReg(rb=p, re=p + 100, qb=0, qe=100, rid=0, score=100)
        # fold the mate to the revcomp half so that infer_dir's
        # unfolded p2 == p + ins  =>  orientation FR, dist == ins
        rb2 = 2 * l_pac - 1 - (p + int(ins))
        rev = AlnReg(rb=rb2, re=rb2 + 100, qb=0, qe=100, rid=0,
                     score=100)
        all_regs.append([fwd])
        all_regs.append([rev])
    pes = pestat(opt, l_pac, all_regs)
    assert pes[1].failed == 0           # FR orientation inferred
    for d in (0, 2, 3):
        assert pes[d].failed == 1
    # independent recomputation from the raw list
    q = np.sort(inserts)
    n = len(q)
    p25 = int(q[int(0.25 * n + 0.499)])
    p75 = int(q[int(0.75 * n + 0.499)])
    iqr = p75 - p25
    tl = max(int(p25 - 2.0 * iqr + 0.499), 1)
    th = int(p75 + 2.0 * iqr + 0.499)
    sel = q[(q >= tl) & (q <= th)]
    avg = float(sel.mean())
    std = float(np.sqrt(((sel - avg) ** 2).mean()))
    assert abs(pes[1].avg - avg) < 1e-6
    assert abs(pes[1].std - std) < 1e-6
    lo = max(min(int(p25 - 3.0 * iqr + 0.499),
                 int(avg - 4.0 * std + 0.499)), 1)
    hi = max(int(p75 + 3.0 * iqr + 0.499), int(avg + 4.0 * std + 0.499))
    assert pes[1].low == lo and pes[1].high == hi
    inside = ((inserts >= pes[1].low) & (inserts <= pes[1].high)).mean()
    assert inside >= 0.95


# ------------------------------------------- 6. strand symmetry e2e
def test_revcomp_strand_symmetry(tmp_path):
    """Aligning the reverse-complement of every read must produce the
    SAME primary coordinates with the strand flag flipped, the CIGAR
    reversed, and identical NM/MAPQ.  This is a black-box symmetry of
    the whole aligner (seeding + extension + emit); a coordinate-fold
    or strand-handling transcription error breaks it."""
    rng = np.random.default_rng(0x177)
    codes = rng.integers(0, 4, 30000).astype(np.uint8)
    _mem_index(tmp_path, codes)
    prefix = str(tmp_path / "inv_ref.fa")
    reads = simulate_reads(codes, 50, 100, rng, snp_rate=0.01,
                           indel_rate=0.005)
    fq_f = str(tmp_path / "f.fq")
    write_fastq(fq_f, reads)
    rc = [(name, "".join(COMP[b] for b in reversed(seq)), pos, strand)
          for (name, seq, pos, strand) in reads]
    fq_r = str(tmp_path / "r.fq")
    write_fastq(fq_r, rc)
    prim_f = {r[0]: r for r in _run_mem(prefix, [fq_f])
              if not int(r[1]) & 0x900}
    prim_r = {r[0]: r for r in _run_mem(prefix, [fq_r])
              if not int(r[1]) & 0x900}
    assert set(prim_f) == set(prim_r)
    n_equal = 0
    for name, rf in prim_f.items():
        rr = prim_r[name]
        if int(rf[1]) & 0x4 or int(rr[1]) & 0x4:
            continue
        assert (int(rf[1]) ^ int(rr[1])) & 0x10 == 0x10, name
        assert rf[3] == rr[3], name          # POS identical
        cf = CIG_RE.findall(rf[5])
        cr = CIG_RE.findall(rr[5])
        # NOT required: exact mirror-image CIGARs.  bwa generates the
        # CIGAR by global DP on the revcomped query for reverse-strand
        # hits, so equally-scoring indel placements legitimately land
        # at different offsets (upstream behavior).  The op MULTISET,
        # POS, NM and MAPQ are strand-invariant.
        assert sorted(cf) == sorted(cr), name
        tf = {t.split(":")[0]: t for t in rf[11:]}
        tr = {t.split(":")[0]: t for t in rr[11:]}
        assert tf.get("NM") == tr.get("NM"), name
        assert rf[4] == rr[4], name          # MAPQ identical
        n_equal += 1
    assert n_equal >= 45


# ----------------------------------- 7. PE record-level consistency
def test_pe_flag_pos_tlen_consistency(tmp_path):
    """Structural SAM invariants on PE output, checked from the
    records alone: mate POS/RNEXT cross-reference each other, TLEN is
    antisymmetric and equals the signed outer span for proper FR
    pairs, flags 0x40/0x80 partition, and a proper pair (0x2) implies
    both mates mapped on the same contig."""
    rng = np.random.default_rng(0x288)
    codes = rng.integers(0, 4, 40000).astype(np.uint8)
    _mem_index(tmp_path, codes)
    prefix = str(tmp_path / "inv_ref.fa")
    pairs = simulate_pairs(codes, 120, 100, rng, snp_rate=0.01)
    fq1 = str(tmp_path / "p1.fq")
    fq2 = str(tmp_path / "p2.fq")
    write_fastq(fq1, [(n, s1, p, st) for (n, s1, s2, p, st) in pairs])
    write_fastq(fq2, [(n, s2, p, st) for (n, s1, s2, p, st) in pairs])
    recs = _run_mem(prefix, [fq1, fq2])
    prim = {}
    for r in recs:
        flag = int(r[1])
        if flag & 0x900:
            continue
        assert flag & 0x1, r[0]
        which = 0 if flag & 0x40 else 1
        assert (flag & 0x40 != 0) != (flag & 0x80 != 0), r[0]
        prim.setdefault(r[0], [None, None])[which] = r
    n_proper = 0
    for name, (r1, r2) in prim.items():
        assert r1 is not None and r2 is not None, name
        f1, f2 = int(r1[1]), int(r2[1])
        if f1 & 0x4 or f2 & 0x4:
            continue
        # mate cross-references
        assert r1[7] == r2[3] and r2[7] == r1[3], name
        assert r1[6] in ("=", r2[2]) and r2[6] in ("=", r1[2]), name
        assert ((f1 & 0x20 != 0) == (f2 & 0x10 != 0)), name
        t1, t2 = int(r1[8]), int(r2[8])
        assert t1 == -t2, name
        if f1 & 0x2:
            assert f2 & 0x2
            assert r1[6] == "=" and r2[6] == "=", name
            lo = min(int(r1[3]), int(r2[3]))
            rl1 = sum(int(n) for n, op in CIG_RE.findall(r1[5])
                      if op in "MD")
            rl2 = sum(int(n) for n, op in CIG_RE.findall(r2[5])
                      if op in "MD")
            hi = max(int(r1[3]) + rl1, int(r2[3]) + rl2)
            assert max(abs(t1), abs(t2)) == hi - lo, name
            n_proper += 1
    assert n_proper >= 100


# ----------------------------------------- 8. golden input checksums
def test_golden_corpus_inputs_pinned():
    """The golden corpus freezes OUTPUT drift; this pins the INPUTS so
    a silent regeneration (which would re-freeze around a semantics
    change) is loud.  Regenerating the corpus intentionally requires
    updating these digests in the same commit."""
    pinned = {
        "ref.fa": "fe96970b93465130c042865fbfc31d9f",
        "se.fq": "a005fe71a367f320e3bd789004290335",
        "pe1.fq": "a25698c52786c65f763450e5ccc4d071",
        "pe2.fq": "cc7bbcb8c3e3004089990efb4b2624e4",
    }
    for name, want in pinned.items():
        data = open(os.path.join(GOLD, name), "rb").read()
        got = hashlib.md5(data).hexdigest()
        assert got == want, (name, got,
                             "golden INPUT changed — if intentional, "
                             "update the pin and regen outputs")
