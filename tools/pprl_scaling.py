"""PPRL Bloom-encode scaling probe (late round 5).

Times the novel data path of pprl.bloom_positions — bigram explode →
md5-nibble double hashing → k-position explode → distinct — at
local[8] vs local[32] over a pre-materialized replicated documents
corpus, aggregate-consumed (count of distinct set bits per record,
summed; no result collection). Each (cores, rep) cell runs in a FRESH
subprocess/JVM like tools/kernel_scaling.py; reps quote min and
median per the round-5 draw-variance convention.

Usage: python tools/pprl_scaling.py [replicas] [reps]
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DOCS_BASE = "/tmp/semlink_pprl_docs"  # suffixed per replica count

CHILD = r"""
import sys, time
sys.path.insert(0, %(repo)r)
from semlink.session import get_spark
from pyspark.sql import functions as F
cpus = int(sys.argv[1])
spark = get_spark("pprl-scaling", cores=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
from semlink.pprl import bloom_positions
df = spark.read.parquet(%(docs)r)
t0 = time.time()
out = (bloom_positions(df, id_col="doc_id", text_col="text")
       .groupBy("doc_id").count().agg(F.sum("count")).collect()[0][0])
print(f"RESULT {time.time() - t0:.3f} {out}")
"""


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # path carries the replica count — a cached corpus from a
    # different scale can never be timed under the wrong label
    docs = f"{DOCS_BASE}_x{replicas}"
    if not os.path.isdir(docs):
        from semlink.session import get_spark
        from pyspark.sql import functions as F
        spark = get_spark("pprl-scaling-gen", cores=8)
        spark.sparkContext.setLogLevel("ERROR")
        d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        reps_df = spark.range(replicas).select(F.col("id").alias("_r"))
        (d.crossJoin(reps_df)
         .select((F.col("doc_id") * replicas + F.col("_r"))
                 .alias("doc_id"), "text")
         .repartition(64).write.mode("overwrite").parquet(docs))
        spark.stop()
    times = {}
    check = set()
    for cores in (8, 32):
        cell = []
        for _ in range(reps):
            out = subprocess.run(
                [sys.executable, "-c", CHILD % {"repo": REPO,
                                                "docs": docs},
                 str(cores)],
                capture_output=True, text=True, check=True)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("RESULT")][0].split()
            cell.append(float(line[1]))
            check.add(line[2])
        times[cores] = cell
    assert len(check) == 1, f"nondeterministic result: {check}"
    t8, t32 = min(times[8]), min(times[32])
    print(json.dumps({
        "kernel": "pprl_bloom_positions", "replicas": replicas,
        "t8_all": times[8], "t32_all": times[32],
        "t8_min": t8, "t32_min": t32,
        "t8_med": statistics.median(times[8]),
        "t32_med": statistics.median(times[32]),
        "eff_min": round((t8 / t32) / 4, 3),
        "eff_med": round((statistics.median(times[8])
                          / statistics.median(times[32])) / 4, 3),
        "checksum": check.pop()}))


if __name__ == "__main__":
    main()
