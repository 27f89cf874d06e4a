"""Quad-independence probe — is today's 8-core aggregate a machine
ceiling or engine coordination?

Motivation: in three consecutive canary-gated valid windows the
coordinated 4x2-executor leg measured 516.8 / 501.2 / 518.8 docs/s
(±2%!) while the 1x2 leg swung 205-257 — an aggregate cap, not run
noise.  If the cap were engine coordination (driver, shuffle
barrier, stragglers), removing ALL coordination would lift it.  This
probe removes all of it: FOUR completely independent 1x2-executor
builds — four drivers, four executor JVMs, four output dirs, zero
shared Spark state — pinned to disjoint core pairs (0-1, 2-3, 4-5,
6-7), vs the same single 1x2 build alone.  Any aggregate the four
independents cannot exceed is, by construction, the machine's
8-busy-core ceiling for this workload; a coordinated 4x2 job
reaching ~that aggregate is scaling as well as the hardware allows.

Canary-stamped before/after like the gated pairs (same healthy
thresholds); corpus identical to the gated pairs (40k page-sized
docs, 160-4,000 tokens, 50k vocab, n_chunks=2).

Usage: python scripts/quad_probe.py [--n-docs 40000] [--repeats 2]
Prints one JSON line; quoted manually in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from canary_gated_scaling import canary  # noqa: E402
from scaling_run import (  # noqa: E402
    IX_DIR, LOCAL_DIR, REPO, gen_corpus,
)

SCRIPT = os.path.join(REPO, "scripts", "scaling_run.py")


def _launch(cpu_range: str, corpus: str, suffix: str,
            n_chunks: int) -> subprocess.Popen:
    cmd = ["taskset", "-c", cpu_range, sys.executable, SCRIPT,
           "--child-executors", "1", "--executor-cores", "2",
           "--corpus", corpus, "--n-chunks", str(n_chunks),
           "--out-suffix", suffix]
    return subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True)


def _result(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate()
    lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(f"child failed: {out[-2000:]}")
    return json.loads(lines[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=40_000)
    ap.add_argument("--doc-tokens", default="160,4000")
    ap.add_argument("--vocab-size", type=int, default=50_000)
    ap.add_argument("--n-chunks", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    lo, hi = (int(x) for x in args.doc_tokens.split(","))
    corpus = gen_corpus(args.n_docs, lo, hi, args.vocab_size)

    pre = canary()
    print(f"canary pre: {pre}", file=sys.stderr)

    solo_best, quad_best = None, None
    for rep in range(args.repeats):
        shutil.rmtree(IX_DIR, ignore_errors=True)
        shutil.rmtree(LOCAL_DIR, ignore_errors=True)
        time.sleep(3)
        print(f"-- rep {rep}: solo 1x2 on cores 0-1 ...",
              file=sys.stderr)
        solo = _result(_launch("0-1", corpus, "solo", args.n_chunks))
        print(f"   {solo}", file=sys.stderr)
        if solo_best is None or solo["docs_per_sec"] > \
                solo_best["docs_per_sec"]:
            solo_best = solo

        shutil.rmtree(IX_DIR, ignore_errors=True)
        time.sleep(3)
        print(f"-- rep {rep}: four independent 1x2 on 0-1/2-3/4-5/"
              "6-7 ...", file=sys.stderr)
        procs = [_launch(f"{2 * i}-{2 * i + 1}", corpus, chr(97 + i),
                         args.n_chunks) for i in range(4)]
        rs = [_result(p) for p in procs]
        for r in rs:
            print(f"   {r}", file=sys.stderr)
        quad = {"jobs": rs,
                "each_dps": [r["docs_per_sec"] for r in rs],
                "aggregate_dps": round(
                    sum(r["docs_per_sec"] for r in rs), 1)}
        if quad_best is None or quad["aggregate_dps"] > \
                quad_best["aggregate_dps"]:
            quad_best = quad

    post = canary()
    print(f"canary post: {post}", file=sys.stderr)
    print(json.dumps({
        "metric": "quad_independence_ceiling",
        "solo_dps": solo_best["docs_per_sec"],
        "quad_each_dps": quad_best["each_dps"],
        "quad_aggregate_dps": quad_best["aggregate_dps"],
        "aggregate_over_solo": round(
            quad_best["aggregate_dps"] / solo_best["docs_per_sec"],
            3),
        "per_job_retained": round(
            (quad_best["aggregate_dps"] / 4)
            / solo_best["docs_per_sec"], 3),
        "n_docs": args.n_docs, "doc_tokens": args.doc_tokens,
        "n_chunks": args.n_chunks,
        "canary_pre": pre, "canary_post": post,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
