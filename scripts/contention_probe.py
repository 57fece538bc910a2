#!/usr/bin/env python3
"""Self-qualifying host-contention probe for scaling sessions.

Run immediately before (and optionally after) a ScalingBench session
and record its one-line JSON with the session (BENCH.md protocol).
Two Spark-free microbenchmarks bracket the box's state:

- reg: a register-resident integer loop (zero memory traffic). The
  same TOTAL work split across 8 vs 32 worker processes. On an idle
  32-core box this scales ~4x; external CPU load shows up here first.
- mem: an aggregate DRAM-streaming loop (64 MB array sum per worker,
  fixed total sums). This saturates memory bandwidth well below 32
  threads on this host (quiet-box efficiency ~0.29 measured in round
  4) -- its value is the BASELINE for what "quiet" looks like, so a
  session's probe can be compared against the quiet-box fingerprint
  rather than an ideal 4.0.

Interpretation is RELATIVE, not absolute: record the probe line with
each session and compare across sessions. A session whose probe shows
the best reg_eff / lowest steal seen on this box is the one that
bounds the code; a session with visibly depressed reg_eff or nonzero
steal is disclosed as host-load-limited rather than standing as the
code's ceiling.
"""
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

np.seterr(over="ignore")


def reg_worker(iters):
    # compute-bound on an L1-resident vector: scales with real cores,
    # (nearly) no DRAM traffic. numpy, because a pure-python int loop
    # is allocation-bound and measures the allocator, not the ALUs.
    a = np.arange(8192, dtype=np.uint64)
    k = np.uint64(0x9E3779B97F4A7C15)
    one = np.uint64(1)
    for _ in range(max(1, iters // 8192)):
        np.multiply(a, k, out=a)
        np.add(a, one, out=a)
    return int(a[0])


def mem_worker(args):
    # aggregate DRAM streaming: a PHYSICALLY-backed array (ones, not
    # zeros -- np.zeros maps copy-on-write zero pages that sum from
    # cache and measure nothing) summed repeatedly.
    n_sums, mb = args
    a = np.ones((mb * 1024 * 1024) // 8, dtype=np.int64)
    t0 = time.time()
    s = 0
    for _ in range(max(1, n_sums)):
        s += int(a.sum())
    return time.time() - t0  # compute-only: allocation/fault excluded


def run_pool(workers, fn, per_worker_arg):
    t0 = time.time()
    with mp.Pool(workers) as p:
        rs = p.map(fn, [per_worker_arg] * workers)
    return time.time() - t0, rs


def run_reg(workers, iters):
    wall, _ = run_pool(workers, reg_worker, iters)
    return wall


def run_mem(workers, args):
    # slowest worker's compute-only time = the aggregate-bandwidth wall
    _, per_worker = run_pool(workers, mem_worker, args)
    return max(per_worker)


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def cpu_times():
    # user nice system idle iowait irq softirq steal
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:9]
    return [int(x) for x in parts]


def steal_pct(before, after):
    d = [b - a for a, b in zip(before, after)]
    total = sum(d)
    return round(100.0 * d[7] / total, 2) if total else 0.0


def main():
    total_reg = int(os.environ.get("PROBE_REG_ITERS", 64_000_000_000))
    total_sums = int(os.environ.get("PROBE_MEM_SUMS", 128))
    mb = int(os.environ.get("PROBE_MEM_MB", 256))
    load_before = loadavg()
    # same total work at both widths; worker count divides both totals
    reg8 = run_reg(8, total_reg // 8)
    st0 = cpu_times()
    reg32 = run_reg(32, total_reg // 32)
    st1 = cpu_times()
    mem8 = run_mem(8, (total_sums // 8, mb))
    mem32 = run_mem(32, (total_sums // 32, mb))
    out = {
        "probe": "contention",
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "loadavg_before": load_before,
        "loadavg_after": loadavg(),
        "reg_8_sec": round(reg8, 3),
        "reg_32_sec": round(reg32, 3),
        "reg_eff_8_32": round(reg8 / reg32 / 4.0, 3),
        "steal_pct_during_reg32": steal_pct(st0, st1),
        "mem_8_sec": round(mem8, 3),
        "mem_32_sec": round(mem32, 3),
        "mem_eff_8_32": round(mem8 / mem32 / 4.0, 3),
    }
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
