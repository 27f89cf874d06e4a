"""Parallel first-touch bandwidth probe — quantifies the host's
aggregate page-fault service ceiling.

BASELINE.md attributes this sandbox's sub-linear N-vs-4N build
scaling to the hypervisor throttling page-fault service (first-touch
bandwidth 30-100x below healthy hosts, while pure-CPU loops scale
cleanly).  This probe measures the ceiling DIRECTLY: W worker
processes, each repeatedly allocating a fresh 256 MB anonymous
mmap region and touching every page once (pure first-touch fault
work, no compute, no shared state), pinned to distinct CPUs.  If
aggregate MB/s saturates at some W* << machine cores, any
allocation-heavy workload — a tokenize-everything index build is
one — cannot scale past W* cores on this host no matter how it is
partitioned, and an N-vs-4N efficiency measured above W*/4N cores
measures the hypervisor, not the engine.

Usage: python scripts/fault_ceiling_probe.py [--workers 1,2,4,8,16]
Prints one JSON line: per-W aggregate MB/s + per-worker MB/s.
"""

from __future__ import annotations

import argparse
import json
import mmap
import os
import sys
import time


REGION_MB = 256
SECONDS = 6.0


def _worker(cpu: int, out_fd: int) -> None:
    os.sched_setaffinity(0, {cpu})
    page = mmap.PAGESIZE
    deadline = time.time() + SECONDS
    touched = 0
    while time.time() < deadline:
        m = mmap.mmap(-1, REGION_MB << 20)
        # one write per page: each is a minor fault on a fresh region
        for off in range(0, REGION_MB << 20, page):
            m[off] = 1
        m.close()
        touched += REGION_MB
    os.write(out_fd, f"{touched}\n".encode())
    os._exit(0)


def measure(n_workers: int) -> dict:
    r, w = os.pipe()
    pids = []
    t0 = time.time()
    for i in range(n_workers):
        pid = os.fork()
        if pid == 0:
            os.close(r)
            _worker(i, w)
        pids.append(pid)
    os.close(w)
    for pid in pids:
        os.waitpid(pid, 0)
    wall = time.time() - t0
    with os.fdopen(r) as f:
        totals = [int(ln) for ln in f.read().split()]
    agg = sum(totals) / wall
    return {"workers": n_workers,
            "agg_mb_s": round(agg, 1),
            "per_worker_mb_s": round(agg / n_workers, 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", default="1,2,4,8,16")
    args = ap.parse_args()
    runs = [measure(int(w)) for w in args.workers.split(",")]
    one = runs[0]["agg_mb_s"]
    print(json.dumps({
        "metric": "first_touch_fault_ceiling",
        "runs": runs,
        # how many single-cores' worth of fault service the host
        # grants in total — the hard cap on allocation-heavy scaling
        "ceiling_in_single_cores": round(
            max(r["agg_mb_s"] for r in runs) / one, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
