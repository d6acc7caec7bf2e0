"""Per-query measurement harness (guide §1.4): times individual
registry queries against $SPARK_GRAFT_SF_DIR with the noop sink so the
computation is isolated from the sink, and optionally dumps
.explain('formatted') per query.

This file is NOT the driver bench (bench.py is frozen); it exists so
optimization work can cite isolated numbers in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py q1 q2 ...          # time with noop sink
  python bench_extra.py --reps 3 q1 ...    # repeat
  python bench_extra.py --plans plans/r06 --suffix before q1 ...
  python bench_extra.py --count q1 ...     # bench.py-compatible .count()
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    reps, plans_dir, suffix, use_count = 1, None, "", False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif a == "--suffix":
            suffix = "_" + args[i + 1]; i += 2
        elif a == "--count":
            use_count = True; i += 1
        else:
            names.append(a); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from semlink.session import get_spark
    spark = get_spark("semlink-bench-extra", cores=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from semlink.queries import REGISTRY

    out: dict[str, list[float]] = {}
    for name in names:
        fn, _sql = REGISTRY[name]
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            p = os.path.join(plans_dir, f"{name}{suffix}.txt")
            with open(p, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
            print(f"wrote {p}", file=sys.stderr)
        ts = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if use_count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = ts
        print(f"{name}: {ts}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
