"""End-to-end single-end alignment: simulate reads, align via the CLI
surface, validate positions/CIGARs/MAPQ/determinism (SURVEY.md §4)."""
import io
import re

import numpy as np
import pytest

from tpubwa.cli import main_fastmap, main_index, main_mem
from simread import simulate_reads, write_fastq

CIG_RE = re.compile(r"(\d+)([MIDSH])")


def cigar_qlen(cig):
    return sum(int(n) for n, op in CIG_RE.findall(cig) if op in "MIS")


def cigar_rlen(cig):
    return sum(int(n) for n, op in CIG_RE.findall(cig) if op in "MD")


@pytest.fixture(scope="module")
def genome_index(tmp_path_factory):
    rng = np.random.default_rng(77)
    d = tmp_path_factory.mktemp("e2e")
    codes = rng.integers(0, 4, 20000).astype(np.uint8)
    bases = "".join("ACGT"[c] for c in codes)
    fa = d / "ref.fa"
    fa.write_text(">chr1 test\n" + "\n".join(
        bases[i:i + 70] for i in range(0, len(bases), 70)) + "\n")
    assert main_index([str(fa)]) == 0
    return d, codes, str(fa)


def run_mem(prefix, fq, extra=None):
    out = io.StringIO()
    args = ["--device", "scalar"] + (extra or []) + [prefix, fq]
    assert main_mem(args, out=out) == 0
    header, records = [], []
    for line in out.getvalue().splitlines():
        (header if line.startswith("@") else records).append(line)
    return header, [r.split("\t") for r in records if r]


def test_se_clean_reads_exact(genome_index):
    d, codes, prefix = genome_index
    rng = np.random.default_rng(1)
    reads = simulate_reads(codes, 60, 100, rng, snp_rate=0.0,
                           indel_rate=0.0)
    fq = str(d / "clean.fq")
    write_fastq(fq, reads)
    header, recs = run_mem(prefix, fq)
    assert any(h.startswith("@SQ\tSN:chr1\tLN:20000") for h in header)
    by_name = {}
    for r in recs:
        if not (int(r[1]) & 0x900):  # primary only
            by_name[r[0]] = r
    assert len(by_name) == 60
    for name, r in by_name.items():
        _, pos, strand = name.rsplit("_", 2)
        flag = int(r[1])
        assert r[2] == "chr1"
        assert int(r[3]) - 1 == int(pos), name
        assert ((flag >> 4) & 1) == int(strand), name
        assert r[5] == "100M", name
        assert int(r[4]) >= 30, (name, r[4])  # unique -> high mapq
        tags = dict(t.split(":", 2)[::2] for t in r[11:])
        assert tags.get("NM") == "0"
        assert tags.get("MD") == "100"


def test_se_mutated_reads(genome_index):
    d, codes, prefix = genome_index
    rng = np.random.default_rng(2)
    reads = simulate_reads(codes, 80, 100, rng, snp_rate=0.02,
                           indel_rate=0.004)
    fq = str(d / "mut.fq")
    write_fastq(fq, reads)
    _, recs = run_mem(prefix, fq)
    ok = 0
    for r in recs:
        flag = int(r[1])
        if flag & 0x904:
            continue
        name = r[0]
        _, pos, strand = name.rsplit("_", 2)
        # CIGAR consumes the read
        assert cigar_qlen(r[5]) == len(r[9]), r
        if abs(int(r[3]) - 1 - int(pos)) <= 12 and \
                ((flag >> 4) & 1) == int(strand):
            ok += 1
    assert ok >= 76, ok  # >=95% of mutated reads placed correctly


def test_se_deterministic(genome_index):
    d, codes, prefix = genome_index
    rng = np.random.default_rng(3)
    reads = simulate_reads(codes, 20, 100, rng, snp_rate=0.02)
    fq = str(d / "det.fq")
    write_fastq(fq, reads)
    out1 = run_mem(prefix, fq)
    out2 = run_mem(prefix, fq)
    assert out1 == out2


def test_se_unmapped_garbage(genome_index):
    d, codes, prefix = genome_index
    rng = np.random.default_rng(4)
    # reads that don't exist in the genome (poly-AC garbage scrambled)
    reads = [(f"g{i}", "".join("ACGT"[int(rng.integers(0, 4))]
                               for _ in range(100)), 0, 0)
             for i in range(5)]
    fq = str(d / "garbage.fq")
    write_fastq(fq, reads)
    _, recs = run_mem(prefix, fq)
    assert len(recs) == 5
    for r in recs:
        flag = int(r[1])
        # random 100-mers over a 20kb genome should be unmapped (no 19bp
        # exact seed shared, overwhelmingly likely)
        assert flag & 0x4, r


def test_repetitive_region_low_mapq(tmp_path):
    # two identical 300bp copies -> reads inside must get mapq 0
    rng = np.random.default_rng(9)
    unit = rng.integers(0, 4, 300).astype(np.uint8)
    genome = np.concatenate([rng.integers(0, 4, 500).astype(np.uint8), unit,
                             rng.integers(0, 4, 500).astype(np.uint8), unit,
                             rng.integers(0, 4, 500).astype(np.uint8)])
    bases = "".join("ACGT"[c] for c in genome)
    fa = tmp_path / "rep.fa"
    fa.write_text(">c\n" + bases + "\n")
    assert main_index([str(fa)]) == 0
    reads = [("rep0_500_0", "".join("ACGT"[c] for c in unit[50:150]), 0, 0)]
    fq = str(tmp_path / "rep.fq")
    write_fastq(fq, reads)
    _, recs = run_mem(str(fa), fq)
    primary = [r for r in recs if not (int(r[1]) & 0x900)]
    assert len(primary) == 1
    assert int(primary[0][4]) == 0  # ambiguous placement -> mapq 0
    # XA tag must list the alternative location
    tags = dict(t.split(":", 2)[::2] for t in primary[0][11:])
    assert "XA" in tags


def test_fastmap_output(genome_index):
    d, codes, prefix = genome_index
    reads = [("f0", "".join("ACGT"[c] for c in codes[1000:1100]), 1000, 0)]
    fq = str(d / "fm.fq")
    write_fastq(fq, reads)
    out = io.StringIO()
    assert main_fastmap([prefix, fq], out=out) == 0
    lines = out.getvalue().splitlines()
    assert lines[0] == "SQ\tf0\t100"
    em = [l for l in lines if l.startswith("EM")]
    assert em, lines
    # unique read: one full-length SMEM at chr1:+1001
    fields = em[0].split("\t")
    assert fields[1] == "0" and fields[2] == "100" and fields[3] == "1"
    assert fields[4] == "chr1:+1001"
    assert lines[-1] == "//"


def test_se_batch_size_invariance(genome_index):
    """SE output must be byte-identical regardless of -K chunking (the
    documented PE pestat caveat does NOT apply to SE; SURVEY.md §3.2,
    §4.5)."""
    d, codes, prefix = genome_index
    rng = np.random.default_rng(9)
    reads = simulate_reads(codes, 60, 100, rng, snp_rate=0.02)
    fq = str(d / "bsz.fq")
    write_fastq(fq, reads)
    base = run_mem(prefix, fq)[1]
    for k in (700, 2300):
        got = run_mem(prefix, fq, extra=["-K", str(k)])[1]
        assert got == base, k


def test_preset_changes_options(genome_index):
    """-x intractg must change scoring (bwa fastmap.c preset table)."""
    from tpubwa.opts import preset
    p = preset("intractg")
    assert p["b"] == 9 and p["o_del"] == 16
    p2 = preset("pacbio")
    assert p2["min_seed_len"] == 17


def test_bwa_format_index_end_to_end(genome_index, tmp_path):
    """Aligning from a stock-bwa-format index (.bwt/.sa/.pac/.ann/.amb
    written by save_bwa, read by load_bwa) gives byte-identical records
    to the native npz index (SURVEY.md §2 row 16 step-1 interop)."""
    import shutil
    from tpubwa.cli import load_index
    d, codes, prefix = genome_index
    rng = np.random.default_rng(21)
    reads = simulate_reads(codes, 30, 100, rng, snp_rate=0.02)
    fq = str(d / "interop.fq")
    write_fastq(fq, reads)
    base = run_mem(prefix, fq)[1]
    # write only bwa-format files under a fresh prefix
    fmi = load_index(prefix)
    bdir = tmp_path / "bwafmt"
    bdir.mkdir()
    bpref = str(bdir / "ref.fa")
    fmi.save_bwa(bpref)
    got = run_mem(bpref, fq)[1]
    assert got == base
