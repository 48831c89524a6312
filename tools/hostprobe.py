"""Host capability probes behind the scaling protocol (no Ray involved).

The N-vs-4N scaling criterion measures wall throughput; these probes
separate what the ENGINE scales from what the HOST can physically
deliver, so BASELINE.md can attribute each phase honestly:

- ``cpu``:   sustained multiprocessing throughput of a pure-Python
             integer loop (touches no memory) at several pool sizes.
- ``membw``: aggregate memcpy bandwidth (numpy .copy of 200 MB) at
             several pool sizes — the ceiling for every shuffle /
             object-store / seal phase.
- ``steal``: /proc/stat system/steal shares over a sampling window
             (run alongside a workload to see hypervisor pressure).

Usage: python tools/hostprobe.py [cpu|membw|steal|all]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def _burn(n):
    s = 0
    for i in range(n):
        s += i * i
    return s


def cpu_probe(sizes=(4, 8, 16, 32), tasks_per_proc=8, n=2_000_000):
    out = {}
    for p in sizes:
        with mp.Pool(p) as pool:
            pool.map(_burn, [200_000] * p)  # warm
            t0 = time.perf_counter()
            pool.map(_burn, [n] * (p * tasks_per_proc))
            dt = time.perf_counter() - t0
        out[p] = round(p * tasks_per_proc / dt, 1)
    base = min(out)
    out["efficiency_4x"] = {
        f"{a}->{b}": round(out[b] / out[a] / (b / a), 2)
        for a, b in [(base, base * 4)] if base * 4 in out
    }
    return out


def _copy_bench(_):
    a = np.ones(200_000_000 // 8)
    t0 = time.perf_counter()
    for _ in range(5):
        a.copy()
    return 5 * 0.2 / (time.perf_counter() - t0)


def membw_probe(sizes=(1, 2, 8, 32)):
    out = {}
    for p in sizes:
        with mp.Pool(p) as pool:
            res = pool.map(_copy_bench, range(p))
        out[p] = {"per_proc_GBs": round(float(np.mean(res)), 2),
                  "aggregate_GBs": round(float(np.sum(res)), 2)}
    return out


def steal_probe(seconds=10):
    def snap():
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:9]))

    a = snap()
    time.sleep(seconds)
    b = snap()
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    names = ["user", "nice", "system", "idle", "iowait", "irq",
             "softirq", "steal"]
    return {n: round(100 * v / tot, 1) for n, v in zip(names, d)}


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    res = {}
    if which in ("cpu", "all"):
        res["cpu_tasks_per_sec"] = cpu_probe()
    if which in ("membw", "all"):
        res["memcpy_bandwidth"] = membw_probe()
    if which in ("steal", "all"):
        res["cpu_shares_pct"] = steal_probe()
    print(json.dumps(res, indent=1))
