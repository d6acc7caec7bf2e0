"""Two-parallelism-level scaling cells for the session-3 operators
(SURVEY §2 rows C24/C25/X16/X17/A10/S8/V1).

The north rule's N-vs-4N-executor criterion cannot use a real cluster
in this sandbox, so — per the established protocol (BENCH/BASELINE.md
§1/§8) — each query runs at local[8] and local[32] in a FRESH
subprocess JVM per draw, N=3 draws per cell, consumed with the bench
harness's own `.count()` protocol at the bench sf. Reports median and
min wall per cell plus t8/t32 speedup and 4×-width efficiency.

Usage: python tools/newops_scaling.py [sf_dir] [draws]
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = ["dedup_containment", "text_lm_perplexity", "text_novelty",
           "sample_token_budget", "rl_pagerank_prior",
           "media_video_frames", "media_ahash_dedup"]

CHILD = r"""
import sys, time
sys.path.insert(0, %(repo)r)
from semlink.session import get_spark
name, cpus, sf = sys.argv[1], int(sys.argv[2]), sys.argv[3]
spark = get_spark("newops-scaling", cores=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
from semlink.queries import REGISTRY
fn = REGISTRY[name][0]
t0 = time.time()
n = fn(spark, sf).count()
print("RESULT", time.time() - t0, n, flush=True)
"""


def run_cell(name: str, cpus: int, sf: str, draws: int) -> list[float]:
    out = []
    for _ in range(draws):
        r = subprocess.run(
            [sys.executable, "-c", CHILD % {"repo": REPO},
             name, str(cpus), sf],
            capture_output=True, text=True, check=True)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("RESULT")][-1]
        out.append(float(line.split()[1]))
    return out


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    draws = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    for name in QUERIES:
        t8 = run_cell(name, 8, sf, draws)
        t32 = run_cell(name, 32, sf, draws)
        m8, m32 = statistics.median(t8), statistics.median(t32)
        print(json.dumps({
            "query": name, "sf": sf, "draws": draws,
            "t8_median": round(m8, 2), "t8_min": round(min(t8), 2),
            "t32_median": round(m32, 2), "t32_min": round(min(t32), 2),
            "speedup": round(m8 / m32, 2),
            "efficiency_4x": round(m8 / m32 / 4, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
