"""Native (C, zlib) FASTQ/FASTA batch reader == Python line parser
(kseq.h/kopen.c equivalent; SURVEY.md §2 row 21)."""
import gzip
import os

import numpy as np
import pytest

from tpubwa.io.fastq import FastqReader, read_fastq_batch


def _records(path):
    r = FastqReader(path)
    out = [(x.name, x.comment, x.seq.tolist(), x.qual) for x in r]
    r.close()
    return out


def _write_mixed(path, gz=False):
    body = (
        "@r1 comment one\nACGTN\n+\nIIIII\n"
        "@r2\nacgt\n+r2\nJJJJ\n"
        ">f1 fasta rec\nACGT\nACGT\nNN\n"
        "@r3\nGG\nGG\n+\nII\nII\n"        # multi-line FASTQ
        ">f2\nTTTT\n"
    )
    if gz:
        with gzip.open(path, "wt") as fh:
            fh.write(body)
    else:
        with open(path, "w") as fh:
            fh.write(body)


@pytest.mark.parametrize("gz", [False, True])
def test_native_matches_python(tmp_path, gz, monkeypatch):
    p = str(tmp_path / ("x.fq.gz" if gz else "x.fq"))
    _write_mixed(p, gz)
    native = _records(p)
    monkeypatch.setenv("TPUBWA_NO_NATIVE_IO", "1")
    python = _records(p)
    assert native == python
    assert len(native) == 5
    assert native[0] == ("r1", "comment one", [0, 1, 2, 3, 4], "IIIII")
    assert native[2][3] is None            # FASTA: no qual
    assert native[3] == ("r3", "", [2, 2, 2, 2], "IIII")


def test_native_large_roundtrip(tmp_path):
    """Batches crossing the native buffer refill boundary."""
    rng = np.random.default_rng(0)
    p = str(tmp_path / "big.fq.gz")
    n = 3000
    with gzip.open(p, "wt") as fh:
        for i in range(n):
            L = int(rng.integers(50, 200))
            s = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
            fh.write(f"@read{i} c{i}\n{s}\n+\n{'F' * L}\n")
    recs = _records(p)
    assert len(recs) == n
    assert recs[-1][0] == f"read{n-1}"
    assert all(len(r[2]) == len(r[3]) for r in recs)


def test_batching_semantics_identical(tmp_path, monkeypatch):
    """read_fastq_batch chunk boundaries must not depend on the
    backend (pestat chunk semantics, resume determinism)."""
    rng = np.random.default_rng(1)
    p1, p2 = str(tmp_path / "a.fq"), str(tmp_path / "b.fq")
    for p, seed in ((p1, 2), (p2, 3)):
        r2 = np.random.default_rng(seed)
        with open(p, "w") as fh:
            for i in range(500):
                L = int(r2.integers(60, 160))
                s = "".join("ACGT"[c] for c in r2.integers(0, 4, L))
                fh.write(f"@q{i}\n{s}\n+\n{'#' * L}\n")

    def batches():
        rd = [FastqReader(p1), FastqReader(p2)]
        out = []
        while True:
            b = read_fastq_batch(rd, 20000)
            if not b:
                break
            out.append([r.name for r in b])
        for r in rd:
            r.close()
        return out

    native = batches()
    monkeypatch.setenv("TPUBWA_NO_NATIVE_IO", "1")
    python = batches()
    assert native == python


def test_malformed_raises(tmp_path):
    p = str(tmp_path / "bad.fq")
    with open(p, "w") as fh:
        fh.write("@r1\nACGT\n+\nII\n")  # qual shorter than seq
    with pytest.raises(Exception):
        _records(p)
