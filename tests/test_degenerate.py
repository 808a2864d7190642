"""Degenerate inputs must not crash any seed mode, and all modes must
agree: poly-repeat genomes (worst-case SMEM stacks), tiny references,
reads longer than the genome, N chromosomes, many tiny contigs."""
import io
import os
import tempfile

import numpy as np
import pytest

import tpubwa.device  # noqa: F401
from tpubwa.cli import main_index, main_mem


def _run_case(monkeypatch, ref_seqs, reads, modes=("host", "megaq")):
    d = tempfile.mkdtemp()
    fa = os.path.join(d, "r.fa")
    with open(fa, "w") as f:
        for i, s in enumerate(ref_seqs):
            f.write(f">s{i}\n{s}\n")
    assert main_index([fa]) == 0
    fq = os.path.join(d, "r.fq")
    with open(fq, "w") as f:
        for i, s in enumerate(reads):
            f.write(f"@q{i}\n{s}\n+\n{'I' * len(s)}\n")
    outs = []
    for mode in modes:
        monkeypatch.setenv("TPUBWA_SEED_MODE", mode)
        out = io.StringIO()
        assert main_mem(["--device", "cpu", fa, fq], out=out) == 0
        outs.append([l for l in out.getvalue().splitlines()
                     if not l.startswith("@PG")])
    assert all(o == outs[0] for o in outs)
    return outs[0]


def test_poly_repeat_genome(monkeypatch):
    rng = np.random.default_rng(7)
    rand = "".join("ACGT"[c] for c in rng.integers(0, 4, 100))
    _run_case(monkeypatch, ["AC" * 1000],
              ["AC" * 50, "CA" * 50, rand])


def test_tiny_ref_and_long_read(monkeypatch):
    rng = np.random.default_rng(8)
    rand = "".join("ACGT"[c] for c in rng.integers(0, 4, 100))
    _run_case(monkeypatch, ["ACGTACGTACGTACGT"],
              [rand, "ACGTACGTACGTACGT" * 7])


def test_n_chromosome(monkeypatch):
    rng = np.random.default_rng(9)
    rand = "".join("ACGT"[c] for c in rng.integers(0, 4, 2000))
    r = rand[100:180]
    _run_case(monkeypatch, ["N" * 500, rand], [r, "N" * 90])


def test_many_tiny_contigs(monkeypatch):
    rng = np.random.default_rng(10)
    contigs = ["".join("ACGT"[c] for c in rng.integers(0, 4, 60))
               for _ in range(30)]
    reads = ["".join("ACGT"[c] for c in rng.integers(0, 4, 70))
             for _ in range(4)]
    _run_case(monkeypatch, contigs, reads)


def test_max_occ_zero(monkeypatch):
    """-c 0 (bwa's max-occurrence flag at its degenerate floor) must
    not crash the native SA path (was a SIGFPE: sz / max_occ)."""
    rng = np.random.default_rng(11)
    rand = "".join("ACGT"[c] for c in rng.integers(0, 4, 3000))
    d = tempfile.mkdtemp()
    fa = os.path.join(d, "r.fa")
    open(fa, "w").write(f">s\n{rand}\n")
    assert main_index([fa]) == 0
    fq = os.path.join(d, "r.fq")
    open(fq, "w").write(f"@q\n{rand[100:200]}\n+\n{'I' * 100}\n")
    for mode in ("host", "megaq"):
        monkeypatch.setenv("TPUBWA_SEED_MODE", mode)
        out = io.StringIO()
        assert main_mem(["--device", "cpu", "-c", "0", fa, fq],
                        out=out) == 0, mode
