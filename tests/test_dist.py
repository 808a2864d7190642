"""Multi-host sharding: shard outputs merged == unsharded output
(SURVEY.md §4 item 5, §5.8)."""
import io
import os

import numpy as np
import pytest

from tpubwa.cli import main_index, main_mem, main_merge
from tpubwa.dist.records import count_records, shard_readers
from tpubwa.dist.sharding import byte_range_shards, fastq_shard_reader
from simread import simulate_pairs, simulate_reads, write_fastq


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(55)
    d = tmp_path_factory.mktemp("dist")
    codes = rng.integers(0, 4, 15000).astype(np.uint8)
    fa = d / "ref.fa"
    fa.write_text(">chrD\n" + "".join("ACGT"[c] for c in codes) + "\n")
    assert main_index([str(fa)]) == 0
    reads = simulate_reads(codes, 60, 100, rng, snp_rate=0.01)
    fq = str(d / "se.fq")
    write_fastq(fq, reads)
    pairs = simulate_pairs(codes, 40, 100, rng)
    fq1, fq2 = str(d / "r1.fq"), str(d / "r2.fq")
    write_fastq(fq1, [(n, s1) for n, s1, s2, *_ in pairs])
    write_fastq(fq2, [(n, s2) for n, s1, s2, *_ in pairs])
    return d, str(fa), fq, fq1, fq2


def _mem(prefix, files, flags=None):
    out = io.StringIO()
    argv = ["--device", "scalar"] + (flags or []) + [prefix] + files
    assert main_mem(argv, out=out) == 0
    return out.getvalue()


def test_byte_range_shards_cover_exactly(setup):
    d, prefix, fq, fq1, fq2 = setup
    names_all = [r.name for r in fastq_shard_reader(
        fq, 0, os.path.getsize(fq))]
    for n in (1, 2, 3, 5):
        got = []
        for lo, hi in byte_range_shards(fq, n):
            got.extend(r.name for r in fastq_shard_reader(fq, lo, hi))
        assert got == names_all, n


def test_record_shards_cover_exactly(setup):
    d, prefix, fq, fq1, fq2 = setup
    n = count_records(fq)
    assert n == 60
    for ns in (1, 2, 4, 7):
        got = []
        for i in range(ns):
            (r,) = shard_readers([fq], i, ns)
            got.extend(x.name for x in r)
        assert len(got) == 60 and got == sorted(
            got, key=lambda s: got.index(s))


def test_sharded_se_equals_unsharded(setup, tmp_path):
    d, prefix, fq, fq1, fq2 = setup
    full = _mem(prefix, [fq])
    full_body = [l for l in full.splitlines() if not l.startswith("@")]
    shards = []
    for i in range(3):
        txt = _mem(prefix, [fq], ["--shard", f"{i}/3"])
        p = tmp_path / f"s{i}.sam"
        p.write_text(txt)
        shards.append(str(p))
    out = tmp_path / "merged.sam"
    assert main_merge(["-o", str(out)] + shards) == 0
    merged_body = [l for l in out.read_text().splitlines()
                   if not l.startswith("@")]
    assert merged_body == full_body


def test_sharded_pe_with_fixed_insert(setup, tmp_path):
    """PE sharding is deterministic when -I pins the insert dist
    (without -I, pestat is batch-global — stock bwa has the same
    chunking caveat, SURVEY.md §3.2)."""
    d, prefix, fq, fq1, fq2 = setup
    full = _mem(prefix, [fq1, fq2], ["-I", "350,30"])
    full_body = [l for l in full.splitlines() if not l.startswith("@")]
    parts = []
    for i in range(2):
        txt = _mem(prefix, [fq1, fq2],
                   ["-I", "350,30", "--shard", f"{i}/2"])
        parts.extend(l for l in txt.splitlines()
                     if not l.startswith("@"))
    assert parts == full_body
