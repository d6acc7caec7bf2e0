"""Same-night A/B of individual registry queries across code versions
(VERDICT r03 next #2: rl_ngram_explode and rl_connected_components
drifted monotonically upward across recorded rounds — decide code vs
host noise with a controlled same-night comparison).

Each (codebase, query) cell runs in a FRESH subprocess (own JVM) and
times N consecutive executions of the query at the given sf_dir;
spark.catalog.clearCache() between runs keeps the CacheManager from
serving a prior run's plan. Run 1 carries JIT/codegen warmup — compare
the min / median of runs 2..N across codebases.

Usage:
  git worktree add /tmp/r01code <r01-sha>
  python tools/ab_query.py rl_ngram_explode 5 /root/testdata/sf0.1 \
      /tmp/r01code /root/repo
"""
from __future__ import annotations

import json
import statistics
import subprocess
import sys

CHILD = r"""
import sys, time
repo, qname, n, sf_dir = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
sys.path.insert(0, repo)
from semlink.session import get_spark
spark = get_spark("ab-query", cores=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
from semlink.queries import REGISTRY
fn, _sql = REGISTRY[qname]
for i in range(n):
    spark.catalog.clearCache()
    t0 = time.time()
    cnt = fn(spark, sf_dir).count()
    print("T", i, round(time.time() - t0, 3), cnt, flush=True)
"""


def run_cell(repo: str, qname: str, n: int, sf_dir: str) -> list[float]:
    p = subprocess.run([sys.executable, "-c", CHILD, repo, qname,
                        str(n), sf_dir],
                       capture_output=True, text=True, timeout=3600)
    times = [float(l.split()[2]) for l in p.stdout.splitlines()
             if l.startswith("T ")]
    if len(times) != n:
        raise RuntimeError(f"{repo} {qname}: {p.stderr[-2000:]}")
    return times


def main() -> None:
    qname = sys.argv[1]
    n = int(sys.argv[2])
    sf_dir = sys.argv[3]
    repos = sys.argv[4:]
    out = {"query": qname, "sf_dir": sf_dir, "runs": n, "cells": {}}
    for repo in repos:
        t = run_cell(repo, qname, n, sf_dir)
        warm = t[1:] if len(t) > 1 else t
        out["cells"][repo] = {
            "times": t,
            "min_warm": round(min(warm), 3),
            "median_warm": round(statistics.median(warm), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
