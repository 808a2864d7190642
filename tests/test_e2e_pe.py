"""End-to-end paired-end: insert-size inference, proper pairing, mate
rescue, TLEN/flags (SURVEY.md §3.2)."""
import io

import numpy as np
import pytest

from tpubwa.cli import main_index, main_mem
from simread import simulate_pairs, write_fastq


@pytest.fixture(scope="module")
def pe_setup(tmp_path_factory):
    rng = np.random.default_rng(123)
    d = tmp_path_factory.mktemp("pe")
    codes = rng.integers(0, 4, 30000).astype(np.uint8)
    bases = "".join("ACGT"[c] for c in codes)
    fa = d / "ref.fa"
    fa.write_text(">chrP\n" + "\n".join(
        bases[i:i + 70] for i in range(0, len(bases), 70)) + "\n")
    assert main_index([str(fa)]) == 0
    pairs = simulate_pairs(codes, 120, 100, rng, insert_mean=350,
                           insert_std=25, snp_rate=0.005)
    fq1 = str(d / "r1.fq")
    fq2 = str(d / "r2.fq")
    write_fastq(fq1, [(n, s1) for n, s1, s2, *_ in pairs])
    write_fastq(fq2, [(n, s2) for n, s1, s2, *_ in pairs])
    return str(fa), fq1, fq2, pairs


def run_pe(prefix, fq1, fq2, extra=None):
    out = io.StringIO()
    args = ["--device", "scalar"] + (extra or []) + [prefix, fq1, fq2]
    assert main_mem(args, out=out) == 0
    recs = [l.split("\t") for l in out.getvalue().splitlines()
            if l and not l.startswith("@")]
    return recs


def test_pe_proper_pairs(pe_setup):
    prefix, fq1, fq2, pairs = pe_setup
    recs = run_pe(prefix, fq1, fq2)
    prim = [r for r in recs if not (int(r[1]) & 0x900)]
    assert len(prim) == 2 * len(pairs)
    by_name = {}
    for r in prim:
        by_name.setdefault(r[0], []).append(r)
    n_proper = n_correct = 0
    tlens = []
    for name, rs in by_name.items():
        assert len(rs) == 2, name
        _, p1, p2 = name.rsplit("_", 2)
        r1 = next(r for r in rs if int(r[1]) & 0x40)
        r2 = next(r for r in rs if int(r[1]) & 0x80)
        f1, f2 = int(r1[1]), int(r2[1])
        assert f1 & 0x1 and f2 & 0x1
        if f1 & 0x2:
            n_proper += 1
        if int(r1[3]) - 1 == int(p1) and int(r2[3]) - 1 == int(p2):
            n_correct += 1
            # orientation FR: read1 fwd, read2 rev (as simulated)
            assert not f1 & 0x10 and f1 & 0x20, name
            assert f2 & 0x10 and not f2 & 0x20, name
            # mate fields cross-reference
            assert r1[6] == "=" and int(r1[7]) - 1 == int(p2)
            assert r2[6] == "=" and int(r2[7]) - 1 == int(p1)
            tlens.append(int(r1[8]))
    assert n_proper >= 0.95 * len(pairs), n_proper
    assert n_correct >= 0.95 * len(pairs), n_correct
    # TLEN spans first base of r1 to last of r2: insert ~350
    assert all(260 <= t <= 440 for t in tlens), sorted(set(tlens))[:5]
    for t in tlens:
        assert t > 0


def test_pe_mate_rescue(pe_setup):
    """Corrupt read2 so seeding fails, but rescue from read1 works."""
    prefix, fq1, fq2, pairs = pe_setup
    import re
    name, s1, s2, p1, p2 = pairs[0]
    # scramble the middle of read2 lightly: too many SNPs for a 19bp seed
    rng = np.random.default_rng(5)
    s2l = list(s2)
    for i in range(0, 100, 9):
        s2l[i] = "ACGT"[int(rng.integers(0, 4))]
    d2 = s2l
    import tempfile, os
    d = os.path.dirname(fq1)
    f1 = os.path.join(d, "resc1.fq")
    f2 = os.path.join(d, "resc2.fq")
    # many normal pairs (for pestat) + the corrupted one
    with open(f1, "w") as a, open(f2, "w") as b:
        for n, x1, x2, *_ in pairs[1:61]:
            a.write(f"@{n}\n{x1}\n+\n{'I'*100}\n")
            b.write(f"@{n}\n{x2}\n+\n{'I'*100}\n")
        a.write(f"@{name}\n{s1}\n+\n{'I'*100}\n")
        b.write(f"@{name}\n{''.join(d2)}\n+\n{'I'*100}\n")
    recs = run_pe(prefix, f1, f2)
    target = [r for r in recs if r[0] == name and int(r[1]) & 0x80
              and not (int(r[1]) & 0x900)]
    assert len(target) == 1
    r2 = target[0]
    # rescued: mapped near true position despite heavy corruption
    assert not int(r2[1]) & 0x4
    assert abs(int(r2[3]) - 1 - p2) <= 10, (r2[3], p2)


def test_pe_one_end_unmapped(pe_setup):
    prefix, fq1, fq2, pairs = pe_setup
    import os
    rng = np.random.default_rng(6)
    d = os.path.dirname(fq1)
    f1 = os.path.join(d, "un1.fq")
    f2 = os.path.join(d, "un2.fq")
    garbage = "".join("ACGT"[int(rng.integers(0, 4))] for _ in range(100))
    with open(f1, "w") as a, open(f2, "w") as b:
        for n, x1, x2, *_ in pairs[:30]:
            a.write(f"@{n}\n{x1}\n+\n{'I'*100}\n")
            b.write(f"@{n}\n{x2}\n+\n{'I'*100}\n")
        a.write(f"@solo\n{pairs[31][1]}\n+\n{'I'*100}\n")
        b.write(f"@solo\n{garbage}\n+\n{'I'*100}\n")
    recs = run_pe(prefix, f1, f2)
    solo = {int(r[1]) & 0xC0: r for r in recs if r[0] == "solo"
            and not (int(r[1]) & 0x900)}
    r1, r2 = solo[0x40], solo[0x80]
    f1_, f2_ = int(r1[1]), int(r2[1])
    # read2 either unmapped or rescued to read1's neighborhood; if
    # unmapped it must borrow read1's coordinates (SAM convention)
    if f2_ & 0x4:
        assert f1_ & 0x8
        assert r2[2] == r1[2] and r2[3] == r1[3]
        assert r2[5] == "*"
    else:
        assert abs(int(r2[3]) - int(r1[3])) < 600


def test_pe_zero_insert_variance(pe_setup):
    """pestat std == 0 (all inserts identical): C computes ns=NaN/inf
    and the (int) cast + clamp give pair-score bonus q=0; Python must
    not raise (regression: ZeroDivisionError in mem_pair)."""
    prefix, fq1, fq2, pairs = pe_setup
    import os
    d = os.path.dirname(fq1)
    f1 = os.path.join(d, "fix1.fq")
    f2 = os.path.join(d, "fix2.fq")
    # rewrite mates at one exact insert size from the reference itself
    ref = "".join(l.strip() for l in open(prefix).readlines()[1:])
    comp = str.maketrans("ACGT", "TGCA")
    rows1, rows2 = [], []
    for i in range(24):
        pos = 37 + i * 700
        frag = ref[pos:pos + 300]
        rows1.append((f"z{i}", frag[:100]))
        rows2.append((f"z{i}", frag[-100:].translate(comp)[::-1]))
    write_fastq(f1, rows1)
    write_fastq(f2, rows2)
    recs = run_pe(prefix, f1, f2)
    assert len(recs) >= 48
    proper = [r for r in recs if int(r[1]) & 0x2]
    assert len(proper) >= 40  # identical-insert pairs still pair


def test_smart_pairing_interleaved(pe_setup):
    """-p: one interleaved FASTQ == two-file paired run (fastmap.c
    smart pairing)."""
    import io
    import os
    prefix, fq1, fq2, pairs = pe_setup
    d = os.path.dirname(fq1)
    inter = os.path.join(d, "inter.fq")
    with open(fq1) as a, open(fq2) as b, open(inter, "w") as out:
        while True:
            r1 = [a.readline() for _ in range(4)]
            r2 = [b.readline() for _ in range(4)]
            if not r1[0]:
                break
            out.writelines(r1)
            out.writelines(r2)
    want = run_pe(prefix, fq1, fq2)
    got_out = io.StringIO()
    assert main_mem(["--device", "scalar", "-p", prefix, inter],
                    out=got_out) == 0
    got = [l.split("\t") for l in got_out.getvalue().splitlines()
           if l and not l.startswith("@")]
    assert got == want
