"""Two-parallelism-level scaling cells for the session-3 operators
(SURVEY §2 rows C24/C25/X16/X17/A10/S8/V1).

The sf0.1 documents table is 5,000 rows (~1.5 MB) — far too small for
core width to matter (a first run at query level measured pure
session overhead: widths washed at 8-14 s walls). So, exactly like
tools/datapipe_scaling.py, each cell times the OPERATOR over a
pre-materialized LARGE input (documents replicated ×100 with a
per-replica tail token → 500k distinct docs / ~150 MB text; a
600k-edge page graph; 12k animated-GIF / 12k perceptual-hash
payloads), in a FRESH subprocess JVM per draw at local[8] vs
local[32], N draws per cell, `.count()`-consumed. The north rule's
N-vs-4N criterion is evidenced by t8/t32 medians + 4×-width
efficiency per operator.

Usage: python tools/newops_scaling.py [draws]
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.1"
DOCS = "/tmp/semlink_newops_docs"
EDGES = "/tmp/semlink_newops_edges"
EDGES_BIG = "/tmp/semlink_newops_edges_big"
GIFS = "/tmp/semlink_newops_gifs"
PHASH = "/tmp/semlink_newops_phash"
VECS = "/tmp/semlink_newops_vecs"

KERNELS = ["containment", "lm", "novelty", "budget",
           "pagerank", "pagerank_big", "frames", "ahash", "pq"]

CHILD = r"""
import sys, time
sys.path.insert(0, %(repo)r)
from semlink.session import get_spark
from pyspark.sql import functions as F
kernel, cpus = sys.argv[1], int(sys.argv[2])
spark = get_spark("newops-scaling", cores=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
if kernel == "containment":
    from semlink.datapipe.dedup import containment_dedup
    df = spark.read.parquet(%(docs)r)
    t0 = time.time()
    n = containment_dedup(df).count()
elif kernel == "lm":
    from semlink.datapipe.lm import with_lm_nll
    df = spark.read.parquet(%(docs)r)
    t0 = time.time()
    n = with_lm_nll(df).count()
elif kernel == "novelty":
    from semlink.datapipe.textstats import with_novelty
    df = spark.read.parquet(%(docs)r)
    t0 = time.time()
    n = with_novelty(df).count()
elif kernel == "budget":
    from semlink.datapipe.sampling import token_budget_sample
    df = spark.read.parquet(%(docs)r)
    t0 = time.time()
    n = token_budget_sample(df, "lang", 100000).count()
elif kernel == "pagerank":
    from semlink.graphrank import pagerank
    e = spark.read.parquet(%(edges)r)
    t0 = time.time()
    n = pagerank(e).count()
elif kernel == "pagerank_big":
    from semlink.graphrank import pagerank
    e = spark.read.parquet(%(edges_big)r)
    t0 = time.time()
    n = pagerank(e).count()
elif kernel == "frames":
    from semlink.datapipe.multimodal import extract_frame_stats
    df = spark.read.parquet(%(gifs)r)
    t0 = time.time()
    n = extract_frame_stats(df, every_k=2).count()
elif kernel == "ahash":
    from semlink.datapipe.multimodal import extract_ahash
    df = spark.read.parquet(%(phash)r)
    t0 = time.time()
    n = extract_ahash(df).count()
elif kernel == "pq":
    from semlink.datapipe.simsearch import pq_codebooks, pq_codes
    e = spark.read.parquet(%(vecs)r)
    t0 = time.time()
    cb = pq_codebooks(e, dim=64)
    n = pq_codes(e, cb, dim=64).count()
print("RESULT", time.time() - t0, n, flush=True)
"""


def gen() -> None:
    sys.path.insert(0, REPO)
    from semlink.session import get_spark
    from pyspark.sql import functions as F
    spark = get_spark("newops-gen", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(DOCS):
        d = spark.read.parquet(f"{SF}/documents.parquet")
        reps = spark.range(100).select(F.col("id").alias("r"))
        big = (d.crossJoin(reps)
               .select((F.col("doc_id") + F.col("r") * 1_000_000)
                       .alias("doc_id"),
                       F.concat("text", F.lit(" r"),
                                F.col("r").cast("string")).alias("text"),
                       "lang"))
        big.repartition(32).write.mode("overwrite").parquet(DOCS)
    if not os.path.exists(EDGES):
        l = spark.read.parquet(f"{SF}/lineitem.parquet")
        (l.select((F.col("l_orderkey") % 20000).alias("src_id"),
                  (F.col("l_partkey") % 20000).alias("dst_id"))
         .repartition(32).write.mode("overwrite").parquet(EDGES))
    if not os.path.exists(EDGES_BIG):
        # 10M-edge Knuth-multiplicative graph over 1M nodes: the small
        # lineitem graph (250k distinct edges) is task-overhead
        # dominated and ANTI-scales; this is the size where the
        # superstep joins carry real work per task
        (spark.range(10_000_000)
         .select((F.col("id") % 1_000_000).alias("src_id"),
                 ((F.col("id") * 2654435761) % 1_000_000).alias("dst_id"))
         .repartition(32).write.mode("overwrite").parquet(EDGES_BIG))
    from semlink.datapipe.multimodal import (synthesize_animation_fixtures,
                                             synthesize_phash_fixtures)
    if not os.path.exists(GIFS):
        fx = synthesize_animation_fixtures(40)
        rows = [(f"{mid}_{r}", bytearray(p))
                for r in range(300) for mid, p, _n, _w, _h in fx]
        spark.createDataFrame(rows, "media_id string, payload binary") \
            .repartition(32).write.mode("overwrite").parquet(GIFS)
    if not os.path.exists(VECS):
        # 500k 64-dim vectors: embeddings replicated x100 with a
        # deterministic per-replica rotation of the id space
        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        reps = spark.range(100).select(F.col("id").alias("r"))
        (e.crossJoin(reps)
         .select((F.col("vec_id") + F.col("r") * 1_000_000)
                 .alias("vec_id"), "embedding")
         .repartition(32).write.mode("overwrite").parquet(VECS))
    if not os.path.exists(PHASH):
        fx = synthesize_phash_fixtures(12)
        rows = [(f"{mid}_{r}", bytearray(p))
                for r in range(250) for mid, p, _g in fx]
        spark.createDataFrame(rows, "media_id string, payload binary") \
            .repartition(32).write.mode("overwrite").parquet(PHASH)
    spark.stop()


def run_cell(kernel: str, cpus: int, draws: int) -> list[float]:
    out = []
    env = {**os.environ, "PYTHONWARNINGS": "ignore"}
    for _ in range(draws):
        r = subprocess.run(
            [sys.executable, "-c", CHILD % {
                "repo": REPO, "docs": DOCS, "edges": EDGES,
                "edges_big": EDGES_BIG, "gifs": GIFS, "phash": PHASH,
                "vecs": VECS},
             kernel, str(cpus)],
            capture_output=True, text=True, check=True, env=env)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("RESULT")][-1]
        out.append(float(line.split()[1]))
    return out


def main() -> None:
    draws = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    gen()
    for kernel in KERNELS:
        t8 = run_cell(kernel, 8, draws)
        t32 = run_cell(kernel, 32, draws)
        m8, m32 = statistics.median(t8), statistics.median(t32)
        print(json.dumps({
            "kernel": kernel, "draws": draws,
            "t8_median": round(m8, 2), "t8_min": round(min(t8), 2),
            "t32_median": round(m32, 2), "t32_min": round(min(t32), 2),
            "speedup": round(m8 / m32, 2),
            "efficiency_4x": round(m8 / m32 / 4, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
