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
MEDIA_J = "/tmp/semlink_media_jpeg"
MEDIA_P = "/tmp/semlink_media_png"

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
elif kernel == "minhash":
    from semlink.datapipe.dedup import minhash_signatures
    df = spark.read.parquet(%(docs)r)
    t0 = time.time()
    out = minhash_signatures(df, impl=impl).agg(F.max("mh_0")).collect()[0][0]
elif kernel == "quality":
    # round-4 rewrite (VERDICT r03 wrong #2): regex alpha-count vs
    # translate-deletion alpha-count, full quality expression both ways
    import semlink.datapipe.textstats as ts
    df = spark.read.parquet(%(docs)r)
    t0 = time.time()
    if impl == "regex":
        t = F.col("text")
        d = ts.with_stopword_ratio(df)
        ws = F.size(ts._tokens(t))
        n_chars = F.length(t)
        alpha = F.length(F.regexp_replace(t, r"[^A-Za-z ]", ""))
        q = (F.lit(0.4) * F.least(ws / F.lit(50.0), F.lit(1.0))
             + F.lit(0.3) * F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
             + F.lit(0.3) * F.least(F.col("stop_ratio") * 3.0, F.lit(1.0)))
        out = d.select(q.alias("q")).agg(F.sum("q")).collect()[0][0]
    else:
        out = (ts.with_quality_score(df).agg(F.sum("quality_score"))
               .collect()[0][0])
elif kernel == "wordtok":
    # regexp_extract_all run-count vs translate-classify + replace-collapse
    import semlink.datapipe.textstats as ts
    df = spark.read.parquet(%(docs)r)
    t0 = time.time()
    if impl == "regex":
        out = df.select(F.size(F.regexp_extract_all(
            F.col("text"), F.lit(ts.WORD_RE), 0)).alias("w")) \
            .agg(F.sum("w")).collect()[0][0]
    else:
        out = df.select(ts.word_token_count(F.col("text")).alias("w")) \
            .agg(F.sum("w")).collect()[0][0]
elif kernel == "fingerprint":
    # round-4 rewrite (VERDICT r03 wrong #3): HOF transform string
    # lambda vs exploded-shingle groupBy-min
    import semlink.datapipe.textstats as ts
    df = spark.read.parquet(%(docs)r)
    t0 = time.time()
    if impl == "hof":
        t = F.col("text")
        norm = F.regexp_replace(F.lower(F.trim(t)), r" +", " ")
        toks = ts._tokens(t)
        n = F.size(toks)
        sh = F.when(
            n >= 4,
            F.transform(F.sequence(F.lit(0), n - 4),
                        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, 4)))),
        ).otherwise(F.array(F.md5(F.concat_ws(" ", toks))))
        out = (df.select(F.md5(norm).alias("fe"), F.array_min(sh).alias("fm"))
               .agg(F.max("fe"), F.max("fm")).collect()[0][0])
    else:
        out = (ts.with_fingerprints(df)
               .agg(F.max("fp_exact"), F.max("fp_min_shingle"))
               .collect()[0][0])
elif kernel == "decode":
    # round-5 decoder-throughput cell (VERDICT r04 next #4): the full
    # Arrow mapInPandas pixel-decode path over pre-materialized
    # payloads — JPEG exercises Huffman+IDCT, PNG inflate+unfilter
    from semlink.datapipe.multimodal import extract_pixel_stats
    df = spark.read.parquet(%(media_j)r if impl == "jpeg" else %(media_p)r)
    t0 = time.time()
    out = extract_pixel_stats(df).agg(F.sum("n_px")).collect()[0][0]
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
    if not os.path.exists(os.path.join(MEDIA_J, "_SUCCESS")):
        from semlink.datapipe.multimodal import synthesize_jpeg_fixtures
        fx = synthesize_jpeg_fixtures(600)
        rows = [(f"{mid}_{r}", bytearray(pl))
                for r in range(20) for mid, pl, _w, _h, _c in fx]
        (spark.createDataFrame(rows, "media_id string, payload binary")
         .repartition(64).write.mode("overwrite").parquet(MEDIA_J))
    if not os.path.exists(os.path.join(MEDIA_P, "_SUCCESS")):
        from semlink.datapipe.multimodal import synthesize_media
        d = spark.range(12000).select(
            F.col("id").alias("doc_id"),
            F.md5(F.col("id").cast("string")).alias("text"))
        (synthesize_media(d).select("media_id", "payload")
         .repartition(64).write.mode("overwrite").parquet(MEDIA_P))
    spark.stop()


def run(kernel: str, impl: str, cpus: int) -> float:
    p = subprocess.run(
        [sys.executable, "-c",
         CHILD % {"repo": REPO, "pairs": PAIRS, "docs": DOCS,
                  "media_j": MEDIA_J, "media_p": MEDIA_P},
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
                          ("minhash", ("hof", "exploded")),
                          ("quality", ("regex", "translate")),
                          ("wordtok", ("regex", "runs")),
                          ("fingerprint", ("hof", "exploded")),
                          ("decode", ("jpeg", "png"))):
        if only and kernel != only:
            continue
        row = {"kernel": kernel,
               "n": (n_pairs if kernel == "cosine"
                     else 12000 if kernel == "decode" else n_docs)}
        for impl in impls:
            t32 = run(kernel, impl, 32)
            t8 = run(kernel, impl, 8)
            row[impl] = {"t8": round(t8, 2), "t32": round(t32, 2),
                         "eff": round((t8 / t32) / 4, 3)}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
