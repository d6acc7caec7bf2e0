"""Measure IVF recall@k vs brute-force at fixed nprobe on the testdata
embeddings (BENCH §6). Usage: python tools/ann_recall.py [sf_dir]."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F
    from semlink.datapipe.simsearch import (assign_cells, brute_force_topk,
                                            ivf_topk, kmeans_centroids)
    from semlink.session import get_spark
    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    out = {"sf_dir": sf_dir, "n_vectors": n, "k": 5, "ivf_k": 8}
    cents = kmeans_centroids(e, k=8, iters=3)
    a_c = assign_cells(e.select("vec_id", "embedding"), cents, "vec_id", 1)
    c = a_c.select(F.col("vec_id").alias("cand_id"),
                   F.col("embedding").alias("c_emb"), "cell")
    bfq = e.filter("vec_id < 50").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    bfc = e.select(F.col("vec_id").alias("cand_id"),
                   F.col("embedding").alias("c_emb"))
    truth = {(r.query_id, r.cand_id)
             for r in brute_force_topk(bfc, bfq, k=5).collect()}
    for nprobe in (1, 2, 4):
        a_q = assign_cells(
            e.filter("vec_id < 50").select("vec_id", "embedding"),
            cents, "vec_id", nprobe)
        q = a_q.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_emb"), "cell")
        got = {(r.query_id, r.cand_id)
               for r in ivf_topk(c, q, k=5)
               .dropDuplicates(["query_id", "cand_id"]).collect()}
        out[f"recall_at5_nprobe{nprobe}"] = round(
            len(truth & got) / len(truth), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
