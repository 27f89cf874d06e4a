"""Coordinated-vs-independent probe, phase-controlled.

Question left open by quad_probe.py: the coordinated 4x2-executor
build measured ~517 docs/s in three gated windows while FOUR
independent 1x2 builds aggregated ~1000 docs/s — but those
measurements were minutes apart on a host whose throttle oscillates
on ~10-minute timescales.  This probe removes the phase confound by
ALTERNATING the two topologies back-to-back (coord, quad, coord,
quad) so each adjacent pair shares one host phase, and stamps the
canary between legs.

Both legs run the identical corpus, n_chunks, and 8 pinned cores:
  * coord: one driver + 4 x 2-core executors (local-cluster), the
    north-rule shape
  * quad:  four fully independent 1x2 jobs on disjoint core pairs
    (their aggregate is a coordination-free 8-core reference)

Usage: python scripts/coord_vs_quad.py [--rounds 2]
Prints one JSON line; quoted in BASELINE.md.
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


def _launch(cpu_range: str, corpus: str, suffix: str, n_chunks: int,
            executors: int, exec_cores: int) -> subprocess.Popen:
    cmd = ["taskset", "-c", cpu_range, sys.executable, SCRIPT,
           "--child-executors", str(executors),
           "--executor-cores", str(exec_cores),
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


def _clean():
    shutil.rmtree(IX_DIR, ignore_errors=True)
    shutil.rmtree(LOCAL_DIR, ignore_errors=True)
    time.sleep(3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=40_000)
    ap.add_argument("--doc-tokens", default="160,4000")
    ap.add_argument("--vocab-size", type=int, default=50_000)
    ap.add_argument("--n-chunks", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    lo, hi = (int(x) for x in args.doc_tokens.split(","))
    corpus = gen_corpus(args.n_docs, lo, hi, args.vocab_size)
    rounds = []
    for rd in range(args.rounds):
        _clean()
        c0 = canary()
        print(f"-- round {rd}: coordinated 4x2 ...", file=sys.stderr)
        coord = _result(_launch("0-7", corpus, "c", args.n_chunks,
                                executors=4, exec_cores=2))
        print(f"   {coord}", file=sys.stderr)
        _clean()
        c1 = canary()
        print(f"-- round {rd}: quad independent 1x2 ...",
              file=sys.stderr)
        procs = [_launch(f"{2 * i}-{2 * i + 1}", corpus,
                         chr(97 + i), args.n_chunks,
                         executors=1, exec_cores=2)
                 for i in range(4)]
        rs = [_result(p) for p in procs]
        for r in rs:
            print(f"   {r}", file=sys.stderr)
        agg = round(sum(r["docs_per_sec"] for r in rs), 1)
        c2 = canary()
        rounds.append({
            "coord_dps": coord["docs_per_sec"],
            "quad_each_dps": [r["docs_per_sec"] for r in rs],
            "quad_aggregate_dps": agg,
            "coord_over_quad": round(coord["docs_per_sec"] / agg, 3),
            "canary": [c0, c1, c2],
        })
        print(f"   round {rd}: coord {coord['docs_per_sec']} vs "
              f"quad agg {agg}", file=sys.stderr)

    print(json.dumps({
        "metric": "coordinated_vs_independent_8core",
        "rounds": rounds,
        "n_docs": args.n_docs, "doc_tokens": args.doc_tokens,
        "n_chunks": args.n_chunks,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
