"""J2 evidence (SURVEY §2.5 'measure both'): manual salted join vs
AQE skew-join vs plain shuffle join, on a deliberately skewed probe
side (one surface form carrying ~half the mentions — the 'legion'
shape real anchor dictionaries exhibit).

Usage: python tools/skew_bench.py [n_rows] [cpus]
Prints one JSON line with wall times; writes nothing.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    from pyspark.sql import functions as F
    from semlink.config import SemlinkConfig
    from semlink.linking import salted_candidate_join
    from semlink.session import get_spark
    spark = get_spark("skew-bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # probe side: 50% of mentions share ONE hot key, rest uniform
    m = (spark.range(n)
         .select(F.concat_ws(":", F.lit("m"), "id").alias("mention_id"),
                 F.when(F.col("id") % 2 == 0, F.lit("legion"))
                 .otherwise(F.concat(F.lit("k"), (F.col("id") % 50_000)
                                     .cast("string"))).alias("ngram_norm")))
    m.repartition(cpus).write.mode("overwrite").parquet("/tmp/skew_m")
    # dictionary side: 3 senses per key (so the hot key fans out 3x)
    d = (spark.range(50_001)
         .select(F.when(F.col("id") == 50_000, F.lit("legion"))
                 .otherwise(F.concat(F.lit("k"), F.col("id").cast("string")))
                 .alias("anchor_norm"))
         .withColumn("s", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))))
         .select("anchor_norm",
                 F.concat(F.lit("t"), "s").alias("target_id"),
                 F.lit(10).alias("sense_link_count"),
                 F.lit(30).alias("anchor_link_total"),
                 F.lit(40).alias("anchor_text_total")))
    d.write.mode("overwrite").parquet("/tmp/skew_d")
    m = spark.read.parquet("/tmp/skew_m")
    d = spark.read.parquet("/tmp/skew_d")

    def timed(tag, fn, **conf):
        olds = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        t0 = time.time()
        c = fn().count()
        dt = round(time.time() - t0, 2)
        for k, v in olds.items():
            if v is not None:
                spark.conf.set(k, v)
        return {"wall_s": dt, "rows": c}

    from semlink.linking import with_probabilities
    no_bcast = {"spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"}

    def plain():
        a = with_probabilities(d).withColumnRenamed("anchor_norm",
                                                    "ngram_norm")
        return m.join(a, "ngram_norm")

    out = {"n_rows": n, "cpus": cpus}
    out["plain_no_aqe_skew"] = timed(
        "plain", plain,
        **no_bcast, **{"spark.sql.adaptive.skewJoin.enabled": "false"})
    out["aqe_skew_join"] = timed(
        "aqe", plain,
        **no_bcast,
        **{"spark.sql.adaptive.skewJoin.enabled": "true",
           "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
           "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
               "8MB"})
    hot = m.groupBy("ngram_norm").agg(F.count("*").alias("c")) \
        .filter(F.col("c") >= 100_000) \
        .select(F.col("ngram_norm").alias("anchor_norm"))
    out["manual_salt"] = timed(
        "salt",
        lambda: salted_candidate_join(m, d, hot,
                                      SemlinkConfig(salt_buckets=cpus)),
        **no_bcast)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
