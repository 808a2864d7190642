#!/usr/bin/env python
"""Measure the distributed machinery ALONE (VERDICT r4 Weak #6).

SCALING.md's N-process rows bound machinery cost only as a residual
("upper bound": they also absorb one-core time-slicing of N full
alignment runs).  This script runs the protocol SKELETON with no
alignment work at all — exactly the collectives `tpubwa mem --dist`
uses (cli.py:274-291, 428-443):

    jax.distributed.initialize()           (startup barrier)
    process_index/process_count            (shard assignment input)
    byte_range_shards + plan_shards        (computed, no comm)
    write a header-only shard file
    multihost_utils.process_allgather(2 counters)
    multihost_utils.sync_global_devices    (pre-merge barrier)
    rank 0: main_merge of the N shard files

and reports, per N in {1,2,4,8}: total wall, plus the in-child phase
split (import, initialize, collectives) so the protocol's own cost is
a measured number, not a residual.  Forces CPU backend; a one-core
host still time-slices the N interpreters, but the collectives
themselves are timed inside each child, so their cost is direct.

Usage: python scripts/machinery_overhead.py [--procs 1,2,4,8]
Appends nothing; prints a markdown table for SCALING.md.
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
t_start = time.perf_counter()
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
t_import = time.perf_counter()
jax.distributed.initialize(
    coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
    num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
    process_id=int(os.environ["JAX_PROCESS_ID"]))
pi, pc = jax.process_index(), jax.process_count()
t_init = time.perf_counter()
# deterministic shard assignment: computed, not communicated —
# exercise the real code path on a real file
from tpubwa.dist.sharding import byte_range_shards, plan_shards
shards = plan_shards(%(fq)r, pi, pc)
out = %(out)r + f".shard{pi:05d}"
with open(out, "w") as fh:
    fh.write("@HD\tVN:1.6\tSO:unsorted\n")
t_plan = time.perf_counter()
import numpy as np
from jax.experimental import multihost_utils
counters = multihost_utils.process_allgather(
    np.asarray([0, 0.0]))
multihost_utils.sync_global_devices("tpubwa_mem_shards_done")
t_coll = time.perf_counter()
if pi == 0:
    from tpubwa.cli import main_merge
    main_merge(["-o", %(out)r]
               + [%(out)r + f".shard{i:05d}" for i in range(pc)])
t_merge = time.perf_counter()
print("CHILD" + json.dumps(dict(
    pi=pi,
    import_s=t_import - t_start,
    init_s=t_init - t_import,
    plan_s=t_plan - t_init,
    coll_s=t_coll - t_plan,
    merge_s=t_merge - t_coll,
    total_s=t_merge - t_start)), flush=True)
"""


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def run_skeleton(d, fq, nprocs):
    port = free_port()
    out = os.path.join(d, f"mach{nprocs}.sam")
    code = CHILD % dict(repo=REPO, fq=fq, out=out)
    procs = []
    t0 = time.perf_counter()
    for pid in range(nprocs):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": str(nprocs),
            "JAX_PROCESS_ID": str(pid),
            "PYTHONPATH": REPO + os.pathsep
            + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    outs = [p.communicate(timeout=600) for p in procs]
    wall = time.perf_counter() - t0
    stats = []
    for p, (so, se) in zip(procs, outs):
        if p.returncode != 0:
            print(se[-2000:], file=sys.stderr)
            raise SystemExit(f"child rc={p.returncode}")
        for line in so.splitlines():
            if line.startswith("CHILD"):
                stats.append(json.loads(line[5:]))
    return wall, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,4,8")
    args = ap.parse_args()
    d = tempfile.mkdtemp(prefix="tpubwa-mach-")
    # a real FASTQ for the byte-range planner (1000 records)
    fq = os.path.join(d, "in.fq")
    with open(fq, "w") as fh:
        for i in range(1000):
            fh.write(f"@r{i}\n{'ACGT' * 25}\n+\n{'I' * 100}\n")
    rows = []
    for n in (int(x) for x in args.procs.split(",")):
        wall, stats = run_skeleton(d, fq, n)
        mx = {k: max(s[k] for s in stats)
              for k in ("import_s", "init_s", "plan_s", "coll_s",
                        "merge_s", "total_s")}
        rows.append((n, wall, mx))
        print(f"[mach] N={n}: wall {wall:.2f}s | child max: "
              f"import {mx['import_s']:.2f} init {mx['init_s']:.2f} "
              f"plan+write {mx['plan_s']:.3f} "
              f"collectives {mx['coll_s']:.3f} "
              f"merge {mx['merge_s']:.3f}", flush=True)
    print("\n| N procs | total wall | JAX import (max) | "
          "distributed init (max) | shard plan | collectives "
          "(all-gather + barrier) | rank-0 merge |")
    print("|---|---|---|---|---|---|---|")
    for n, wall, mx in rows:
        print(f"| {n} | {wall:.2f} s | {mx['import_s']:.2f} s | "
              f"{mx['init_s']:.2f} s | {mx['plan_s'] * 1e3:.0f} ms | "
              f"{mx['coll_s'] * 1e3:.0f} ms | "
              f"{mx['merge_s'] * 1e3:.0f} ms |")


if __name__ == "__main__":
    main()
