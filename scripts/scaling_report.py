#!/usr/bin/env python
"""Generate SCALING.md: the 1-chip / 1-host / N-host throughput table
the BASELINE north star asks for (SURVEY.md §5.8).

N-host rows run N REAL processes on localhost CPU through the full
--dist path (jax.distributed init, sharding, barrier, rank-0 merge) —
the environment has one TPU chip and one host core, so the CPU rows
measure the distributed machinery's scaling behavior (sharding skew +
merge overhead), not chip throughput; the 1-chip row quotes the
latest BENCH result on real hardware.

Usage: python scripts/scaling_report.py [--pairs 4000]
"""
import argparse
import glob
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def setup_inputs(d, n_pairs):
    from tpubwa.cli import main_index
    sys.path.insert(0, os.path.join(REPO, "tests"))
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, 2_000_000).astype(np.uint8)
    bases = "".join("ACGT"[c] for c in codes)
    fa = os.path.join(d, "ref.fa")
    with open(fa, "w") as fh:
        fh.write(">s1\n")
        for i in range(0, len(bases), 70):
            fh.write(bases[i:i + 70] + "\n")
    main_index([fa])
    r1 = os.path.join(d, "r1.fq")
    r2 = os.path.join(d, "r2.fq")
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(n_pairs):
            isize = max(int(rng.normal(350, 30)), 220)
            pos = int(rng.integers(0, len(codes) - isize - 2))
            s1 = bases[pos:pos + 100]
            rc = codes[pos + isize - 100:pos + isize]
            s2 = "".join("ACGT"[3 - c] for c in rc[::-1])
            f1.write(f"@p{i}\n{s1}\n+\n{'I' * 100}\n")
            f2.write(f"@p{i}\n{s2}\n+\n{'I' * 100}\n")
    return fa, r1, r2


def run_dist(d, fa, r1, r2, nprocs):
    out = os.path.join(d, f"out{nprocs}.sam")
    for old in glob.glob(out + "*"):
        os.remove(old)
    port = free_port()
    procs = []
    t0 = time.perf_counter()
    for pid in range(nprocs):
        env = dict(os.environ)
        env.update({
            "TPUBWA_JAX_PLATFORMS": "cpu",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": str(nprocs),
            "JAX_PROCESS_ID": str(pid),
            "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "tpubwa.cli", "mem", "--dist",
             "--device", "cpu", "-o", out, fa, r1, r2],
            env=env, cwd=d, stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE, text=True))
    errs = [p.communicate(timeout=1800)[1] for p in procs]
    dt = time.perf_counter() - t0
    if not all(p.returncode == 0 for p in procs):
        for p, e in zip(procs, errs):
            if p.returncode != 0:
                print(f"[scaling] proc rc={p.returncode}:\n"
                      + (e or "")[-1500:], file=sys.stderr)
        raise SystemExit(1)
    n = sum(1 for l in open(out) if not l.startswith("@"))
    return dt, n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=400)
    args = ap.parse_args()
    d = tempfile.mkdtemp(prefix="tpubwa-scaling-")
    fa, r1, r2 = setup_inputs(d, args.pairs)
    n_reads = args.pairs * 2
    rows = []
    bodies = {}
    for nprocs in (1, 2, 4):
        dt, n_rec, out = run_dist(d, fa, r1, r2, nprocs)
        with open(out) as fh:
            bodies[nprocs] = [l for l in fh if not l.startswith("@")]
        rows.append((nprocs, dt, n_reads / dt, n_rec))
        print(f"[scaling] {nprocs} proc: {dt:.1f}s "
              f"({n_reads / dt:.0f} reads/s), {n_rec} records",
              file=sys.stderr, flush=True)
    assert bodies[2] == bodies[1] and bodies[4] == bodies[1], \
        "multi-process output differs from single-process"

    bench = {}
    for bp in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")),
                     reverse=True):
        try:
            bench = json.load(open(bp)).get("parsed", {}) or {}
            if bench:
                bench["_file"] = os.path.basename(bp)
                break
        except Exception:
            continue

    base = rows[0][2]
    lines = [
        "# Scaling report (SURVEY.md §5.8 / BASELINE north star)",
        "",
        f"_Generated {time.strftime('%Y-%m-%d %H:%M')} by "
        "`scripts/scaling_report.py`; environment: ONE tunneled TPU "
        "v5e chip, ONE host core (see docs/PERF_NOTES.md). Multi-host "
        "rows are N real processes on localhost CPU through the full "
        "`--dist` path (jax.distributed init, per-process record "
        "shards, barrier, rank-0 merge) with `--device cpu`; they "
        "measure the distributed machinery, not chip throughput._",
        "",
        "| configuration | wall | reads/s | vs 1 proc | output |",
        "|---|---|---|---|---|",
    ]
    for nprocs, dt, rps, n_rec in rows:
        lines.append(
            f"| {nprocs} host-process (CPU, device pipeline) | {dt:.1f} s | "
            f"{rps:.0f} | {rps / base:.2f}x | byte-identical |")
    lines += [
        "",
        "## 1-chip row (real TPU)",
        "",
        "- Round-2 session measurement (2026-08-17, bench.py "
        "median-of-3, mega seeding machine): **5,415 reads/s** — "
        "chr20-scale 64 Mb genome, 100 bp PE; attempts "
        "5392/5415/5594.  The host-seeding default landed after the "
        "chip tunnel died (docs/PERF_NOTES.md), so its chip number "
        "is pending the next driver bench run.",
    ]
    if bench:
        lines += [
            f"- `{bench.get('_file')}`: **{bench.get('value')} "
            f"{bench.get('unit', '')}** — `{bench.get('metric')}`, "
            f"vs_baseline {bench.get('vs_baseline')} (baseline = "
            "1.6e5 reads/s, 32-core Xeon stock bwa-mem estimate).",
        ]
    lines += [
        "",
        "## Notes",
        "",
        "- The single host core serializes FASTQ decode + Python "
        "orchestration, so CPU-row scaling is sublinear by design "
        "here; on a v5p pod slice each host has its own cores and "
        "chips and the same sharding arithmetic applies per host.",
        "- Shard assignment is computed from `process_index` "
        "(no communication); the only collectives are the startup "
        "barrier, one end-of-run counter all-gather, and the final "
        "barrier before the rank-0 merge.",
        "- Output equality across process counts is asserted by this "
        "script and pinned by tests/test_dist_multihost.py.",
    ]
    with open(os.path.join(REPO, "SCALING.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"[scaling] wrote SCALING.md", file=sys.stderr)


if __name__ == "__main__":
    main()
