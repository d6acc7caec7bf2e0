"""Datapipe-kernel scaling probe (VERDICT r02 wrong #2 / next #3).

Measures 8-core vs 32-core wall time for the two ANN/dedup kernels
that round 2 shipped on HOF lambdas, in BOTH implementations:

- cosine: HOF-lambda SQL expression vs Arrow numpy pandas UDF
  (simsearch.cosine_similarity impl='sql' | 'arrow');
- minhash: HOF transform-over-shingle-array vs codegen explode +
  groupBy partial-min (dedup.minhash_signatures impl='hof' |
  'exploded').

Each (kernel, impl, cores) cell runs in a FRESH subprocess (own JVM)
over a pre-materialized parquet input, like tools/kernel_scaling.py —
the measured quantity is the aggregate-consumed kernel, no result
collection. Writes one JSON line per kernel with t8/t32/efficiency
per impl.

Usage: python tools/datapipe_scaling.py [n_pairs] [n_docs]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PAIRS = "/tmp/semlink_cos_pairs"
DOCS = "/tmp/semlink_mh_docs"

CHILD = r"""
import sys, time
sys.path.insert(0, %(repo)r)
from semlink.session import get_spark
from pyspark.sql import functions as F
kernel, impl, cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark("datapipe-scaling", cores=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
if kernel == "cosine":
    from semlink.datapipe.simsearch import cosine_similarity
    df = spark.read.parquet(%(pairs)r)
    t0 = time.time()
    dim = 64 if impl == "fixed" else None
    out = df.select(cosine_similarity("q_emb", "c_emb", impl=impl, dim=dim)
                    .alias("s")).agg(F.sum("s")).collect()[0][0]
else:
    from semlink.datapipe.dedup import minhash_signatures
    df = spark.read.parquet(%(docs)r)
    t0 = time.time()
    out = minhash_signatures(df, impl=impl).agg(F.max("mh_0")).collect()[0][0]
print("RESULT", time.time() - t0, out, flush=True)
"""


def gen(n_pairs: int, n_docs: int) -> None:
    from pyspark.sql import functions as F
    from semlink.session import get_spark
    spark = get_spark("datapipe-scaling-gen", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(PAIRS, "_SUCCESS")):
        dim = 64
        vec = lambda salt: F.array(*[
            ((F.col("id") * (31 + salt) + j) % 997).cast("double") / 997.0
            for j in range(dim)])
        (spark.range(n_pairs)
         .select(vec(0).alias("q_emb"), vec(7).alias("c_emb"))
         .repartition(64).write.mode("overwrite").parquet(PAIRS))
    if not os.path.exists(os.path.join(DOCS, "_SUCCESS")):
        words = [f"w{i}" for i in range(50)]
        tok = lambda j: F.element_at(
            F.array(*[F.lit(w) for w in words]),
            ((F.col("id") * 13 + j * 7) % 50 + 1).cast("int"))
        (spark.range(n_docs)
         .select(F.col("id").alias("doc_id"),
                 F.concat_ws(" ", *[tok(j) for j in range(40)]).alias("text"))
         .repartition(64).write.mode("overwrite").parquet(DOCS))
    spark.stop()


def run(kernel: str, impl: str, cpus: int) -> float:
    p = subprocess.run(
        [sys.executable, "-c",
         CHILD % {"repo": REPO, "pairs": PAIRS, "docs": DOCS},
         kernel, impl, str(cpus)],
        capture_output=True, text=True, timeout=3600)
    lines = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
    if not lines:
        raise RuntimeError(f"{kernel}/{impl}@{cpus}: {p.stderr[-2000:]}")
    return float(lines[-1].split()[1])


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    gen(n_pairs, n_docs)
    only = os.environ.get("DPS_ONLY")
    for kernel, impls in (("cosine", ("sql", "arrow", "fixed")),
                          ("minhash", ("hof", "exploded"))):
        if only and kernel != only:
            continue
        row = {"kernel": kernel,
               "n": n_pairs if kernel == "cosine" else n_docs}
        for impl in impls:
            t32 = run(kernel, impl, 32)
            t8 = run(kernel, impl, 8)
            row[impl] = {"t8": round(t8, 2), "t32": round(t32, 2),
                         "eff": round((t8 / t32) / 4, 3)}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
