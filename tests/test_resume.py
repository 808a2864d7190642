"""Checkpoint/resume + observability (SURVEY.md §5.1-5.5): a run killed
mid-way resumes to a byte-identical output; metrics JSONL is written."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tpubwa.cli import main_index
from simread import simulate_reads, write_fastq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(66)
    d = tmp_path_factory.mktemp("resume")
    codes = rng.integers(0, 4, 12000).astype(np.uint8)
    fa = d / "ref.fa"
    fa.write_text(">chrR\n" + "".join("ACGT"[c] for c in codes) + "\n")
    assert main_index([str(fa)]) == 0
    reads = simulate_reads(codes, 60, 100, rng)
    fq = str(d / "se.fq")
    write_fastq(fq, reads)
    return d, str(fa), fq


def _run(args, env_extra=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["TPUBWA_FORCE_CPU"] = "1"
    return subprocess.run(
        [sys.executable, "-m", "tpubwa"] + args,
        capture_output=True, text=True, env=env, timeout=300)


def test_resume_after_kill(setup, tmp_path):
    d, prefix, fq = setup
    full = tmp_path / "full.sam"
    # full run, small -K so multiple batches (journal granularity)
    r = _run(["mem", "--device", "scalar", "-K", "1500", "-o", str(full),
              prefix, fq])
    assert r.returncode == 0, r.stderr[-500:]
    # journaled run: simulate a crash by keeping only the first batch's
    # journal line and truncating the output mid-batch
    out = tmp_path / "part.sam"
    jrn = tmp_path / "journal.jsonl"
    r = _run(["mem", "--device", "scalar", "-K", "1500", "-o", str(out),
              "--journal", str(jrn), prefix, fq])
    assert r.returncode == 0, r.stderr[-500:]
    lines = jrn.read_text().splitlines()
    assert len(lines) >= 3, lines  # several batches
    first = json.loads(lines[0])
    jrn.write_text(lines[0] + "\n")
    with open(out, "r+") as fh:  # garbage past the checkpoint
        fh.truncate(first["bytes"])
        fh.seek(first["bytes"])
        fh.write("TRUNCATED GARBAGE")
    r = _run(["mem", "--device", "scalar", "-K", "1500", "-o", str(out),
              "--journal", str(jrn), prefix, fq])
    assert r.returncode == 0, r.stderr[-500:]
    assert "[resume]" in r.stderr

    def norm(t):  # the @PG CL: line legitimately differs
        return [l for l in t.splitlines() if not l.startswith("@PG")]
    assert norm(out.read_text()) == norm(full.read_text())


def test_metrics_jsonl(setup, tmp_path):
    d, prefix, fq = setup
    out = tmp_path / "o.sam"
    met = tmp_path / "metrics.jsonl"
    r = _run(["mem", "--device", "scalar", "-o", str(out),
              "--metrics", str(met), prefix, fq])
    assert r.returncode == 0, r.stderr[-500:]
    recs = [json.loads(l) for l in met.read_text().splitlines()]
    assert any(x["event"] == "batch" and x["reads"] == 60 for x in recs)
    assert any(x["event"] == "done" for x in recs)
    assert "[main] Real time:" in r.stderr
    assert "stage times:" in r.stderr
