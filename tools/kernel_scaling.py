"""Engine-kernel scaling probe: does the Arrow pandas-UDF scorer (X8)
— the one stage whose compute lives in Python worker PROCESSES, not
Spark's shared-JVM expression eval — scale with cores on this host?

Context: BENCH/BASELINE.md §2 shows Spark SQL *string expression* eval
on this VM saturates at ~2× the 8-core rate (shared-JVM artifact),
capping e2e local[8]→local[32] efficiency near 0.5. This probe isolates
the scorer kernel on a pre-materialized pair table (pure Arrow→numpy
work, no string-expression eval, no shuffle) to show the engine's
operator DOES scale when the substrate does.

Usage: python tools/kernel_scaling.py [n_pairs]
Writes one JSON line with t8, t32, efficiency.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DATA = "/tmp/semlink_kernel_pairs"

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
from semlink.session import get_spark
from semlink.pairs import score_pairs
cpus = int(sys.argv[1])
spark = get_spark("kernel-scaling", cores=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet(%(data)r)
t0 = time.time()
n = score_pairs(df).agg({"pair_score": "sum"}).collect()[0][0]
print("RESULT", time.time() - t0, n, flush=True)
"""


def gen(n_pairs: int) -> None:
    if os.path.exists(os.path.join(DATA, "_SUCCESS")):
        return
    from pyspark.sql import functions as F
    from semlink.session import get_spark
    spark = get_spark("kernel-gen", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    words = ["anaheim", "bordeaux", "carthage", "dresden", "edmonton",
             "florence", "granada", "helsinki"]
    df = (spark.range(n_pairs)
          .withColumn("w1", F.element_at(
              F.array(*[F.lit(w) for w in words]),
              (F.col("id") % 8 + 1).cast("int")))
          .select(
              F.concat_ws(":", F.lit("l"), "id").alias("left_mention_id"),
              F.concat_ws(":", F.lit("r"), "id").alias("right_mention_id"),
              F.concat_ws(" ", "w1", "w1", "w1", "w1",
                          (F.col("id") % 997).cast("string"))
              .alias("ngram_l"),
              F.concat_ws(" ", "w1", "w1", "w1", "w1",
                          (F.col("id") % 991).cast("string"))
              .alias("ngram_r"),
              (F.col("id") % 5).alias("target_l"),
              (F.col("id") % 7 % 5).alias("target_r"),
              ((F.col("id") % 100).cast("double") / 100).alias("prior_l"),
              ((F.col("id") % 83).cast("double") / 83).alias("prior_r"),
              ((F.col("id") % 61).cast("double") / 61).alias("sense_prob_l"),
              ((F.col("id") % 53).cast("double") / 53).alias("sense_prob_r")))
    df.repartition(64).write.mode("overwrite").parquet(DATA)
    spark.stop()


def run(cpus: int) -> float:
    p = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO, "data": DATA},
         str(cpus)],
        capture_output=True, text=True, timeout=1800)
    line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")][-1]
    return float(line.split()[1])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    gen(n)
    t32 = run(32)
    t8 = run(8)
    print(json.dumps({"kernel": "score_pairs (Arrow JW+Lev+commonness)",
                      "n_pairs": n, "t8": round(t8, 2), "t32": round(t32, 2),
                      "eff": round((t8 / t32) / 4, 3)}))


if __name__ == "__main__":
    main()
