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

Interpretation: reg_eff >= ~0.85 means the 32 cores are actually
available (any sub-0.8 Spark scaling number measured in that window
is the engine's, not the neighbors'); reg_eff well below that means
external load -- disclose the session but do not let it stand as the
code's ceiling.
"""
import json
import multiprocessing as mp
import os
import sys
import time


def reg_worker(iters):
    x = 0x9E3779B97F4A7C15
    for _ in range(iters):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    return x


def mem_worker(args):
    n_sums, mb = args
    try:
        import numpy as np
        a = np.zeros((mb * 1024 * 1024) // 8, dtype=np.int64)
        s = 0
        for _ in range(n_sums):
            s += int(a.sum())
        return s
    except ImportError:
        a = bytearray(mb * 1024 * 1024)
        s = 0
        for _ in range(n_sums):
            s += sum(memoryview(a)[::4096])
        return s


def run_pool(workers, fn, per_worker_arg):
    t0 = time.time()
    with mp.Pool(workers) as p:
        p.map(fn, [per_worker_arg] * workers)
    return time.time() - t0


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main():
    total_reg = int(os.environ.get("PROBE_REG_ITERS", 160_000_000))
    total_sums = int(os.environ.get("PROBE_MEM_SUMS", 256))
    mb = int(os.environ.get("PROBE_MEM_MB", 64))
    load_before = loadavg()
    # same total work at both widths; worker count divides both totals
    reg8 = run_pool(8, reg_worker, total_reg // 8)
    reg32 = run_pool(32, reg_worker, total_reg // 32)
    mem8 = run_pool(8, mem_worker, (total_sums // 8, mb))
    mem32 = run_pool(32, mem_worker, (total_sums // 32, mb))
    out = {
        "probe": "contention",
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "loadavg_before": load_before,
        "loadavg_after": loadavg(),
        "reg_8_sec": round(reg8, 3),
        "reg_32_sec": round(reg32, 3),
        "reg_eff_8_32": round(reg8 / reg32 / 4.0, 3),
        "mem_8_sec": round(mem8, 3),
        "mem_32_sec": round(mem32, 3),
        "mem_eff_8_32": round(mem8 / mem32 / 4.0, 3),
    }
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
