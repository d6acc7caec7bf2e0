"""Benchmark harness (SURVEY M6; driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the full
transcript record-linkage pipeline (blocking → pairwise scoring →
checkpointed CC) on a replicated bench-scale fixture, and prints ONE
JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": 0.1,
   "pipeline_turns": N, "pipeline_turns_per_sec": X}

The bench fixture is the deterministic `small` fixture replicated
REPLICAS× in Spark (conv_id remapped per replica) — block keys are
shared across replicas, so blocks grow linearly with scale exactly as
hot surface forms do in real corpora. Generation is cached to
/tmp/semlink_bench and excluded from timing.

Scaling evidence (north rule N vs 4N executors, sandbox proxy):
  SPARK_GRAFT_CPUS=8 python bench.py   vs   SPARK_GRAFT_CPUS=32 ...
tools/scaling_bench.py orchestrates both and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

REPLICAS = int(os.environ.get("SEMLINK_BENCH_REPLICAS", "30"))
BENCH_DIR = os.environ.get("SEMLINK_BENCH_DIR", "/tmp/semlink_bench")

# registry queries timed at the SF dir (one per operator family)
HEADLINE = [
    "rl_ngram_explode", "rl_link_top1", "rl_mention_pairs",
    "rl_largest_matching", "rl_connected_components",
    "rl_relatedness_mw",
    "dedup_minhash_signatures", "dedup_lsh_pairs", "dedup_simhash",
    "dedup_near_dup_clusters",
    "ann_brute_force_topk", "ann_ivf_cell_topk",
    "ann_kmeans_centroids", "ann_ivf_near_dup_edges",
    "text_quality_score", "text_fingerprints", "media_features",
    "media_pixels", "media_audio", "text_langid",
    "text_repetition", "text_heuristic_filters", "text_pii_stats",
    "text_corpus_filter", "ann_embed_text", "media_jpeg",
    "rl_fellegi_sunter", "rl_blocking_quality",
    "rl_cluster_metrics", "rl_golden_record",
    "rl_meta_blocking", "dedup_setsim_join", "rl_cluster_review",
    "agg_pricing_summary",
    "rl_pprl_bloom", "rl_soft_tfidf",
    "dedup_containment", "text_lm_perplexity", "sample_token_budget",
    "rl_pagerank_prior", "text_novelty", "media_video_frames",
    "media_ahash_dedup", "rl_affine_gap",
    "media_ahash_near_pairs", "text_lang_mix", "rl_phonetic_blocking",
    "rl_qgram_blocking", "rl_gap_sessions", "ann_pq_codes",
    "ann_pq_adc_topk", "ann_ivfpq_codes",
]

# headline entries that did not exist in the previous round's bench —
# recorded in the output JSON so round-over-round totals are compared
# on the shared list, not the grown one (VERDICT r02 next #7).
# text_langid existed before but was upgraded in place (stopword-ratio
# heuristic → profile argmax) and was not in the r03 headline.
# round 5: the Gopher/C4 family, PII stats, the text→embedding bridge
# and the baseline JPEG decode did not exist in the r04 headline
NEW_QUERIES = ["text_repetition", "text_heuristic_filters",
               "text_pii_stats", "text_corpus_filter",
               "ann_embed_text", "media_jpeg",
               "rl_fellegi_sunter", "rl_blocking_quality",
               "rl_cluster_metrics", "rl_golden_record",
               "rl_meta_blocking", "dedup_setsim_join",
               "rl_cluster_review",
               # late round 5: PPRL Bloom/Dice (explode + position
               # join) and soft-TF-IDF (Arrow JW kernel over token
               # cross). The other late-r5 entries (incremental link,
               # greedy 1:1, frequency weights, AUC, thresholds) are
               # NOT benched: their cost is the same nation-blocked
               # levenshtein candidate pass rl_fellegi_sunter already
               # times (~25 s each at sf0.1), pure redundancy per draw
               "rl_pprl_bloom", "rl_soft_tfidf",
               # session 2 of round 5: containment dedup, bigram-LM
               # perplexity, token-budget sampling, PageRank prior
               "dedup_containment", "text_lm_perplexity",
               "sample_token_budget", "rl_pagerank_prior",
               "text_novelty", "media_video_frames",
               "media_ahash_dedup", "rl_affine_gap",
               "media_ahash_near_pairs", "text_lang_mix",
               "rl_phonetic_blocking", "rl_qgram_blocking",
               "rl_gap_sessions", "ann_pq_codes", "ann_pq_adc_topk",
               "ann_ivfpq_codes"]
# dedup_cluster_stability is NOT benched: it is two runs of the same
# checkpointed CC dedup_near_dup_clusters already times (~2x its
# wall), pure redundancy per draw


def ensure_bench_fixture(spark) -> str:
    """Replicate the small fixture to bench scale (cached, untimed)."""
    out = os.path.join(BENCH_DIR, f"small_x{REPLICAS}")
    marker = os.path.join(out, "transcripts.parquet", "_SUCCESS")
    if os.path.exists(marker):
        return out
    from semlink.fixtures import generate, to_spark
    fx = generate("small")
    dfs = to_spark(spark, fx)
    reps = spark.range(REPLICAS).select(
        F.col("id").cast("int").alias("rep"))
    t = (dfs["transcripts"].crossJoin(reps)
         .withColumn("conv_id", F.concat_ws("-", "conv_id",
                                            F.col("rep").cast("string")))
         .drop("rep"))
    t.repartition(32).write.mode("overwrite") \
        .parquet(os.path.join(out, "transcripts.parquet"))
    lp = (dfs["labeled_pairs"].crossJoin(reps)
          .select(
              F.concat_ws("-", F.split("left_mention_id", ":").getItem(0),
                          F.col("rep").cast("string")).alias("c1"),
              F.expr("substring(left_mention_id, length(split(left_mention_id, ':')[0]) + 1)").alias("r1"),
              F.concat_ws("-", F.split("right_mention_id", ":").getItem(0),
                          F.col("rep").cast("string")).alias("c2"),
              F.expr("substring(right_mention_id, length(split(right_mention_id, ':')[0]) + 1)").alias("r2"),
              "block_key", "label")
          .select(F.concat("c1", "r1").alias("left_mention_id"),
                  F.concat("c2", "r2").alias("right_mention_id"),
                  "block_key", "label"))
    lp.write.mode("overwrite").parquet(os.path.join(out, "labeled_pairs.parquet"))
    for name in ("anchors", "page_links"):
        dfs[name].write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet"))
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from semlink.session import get_spark
    # SEMLINK_BENCH_MASTER overrides local[cpus] — used for the
    # separate-JVM scaling point (e.g. local-cluster[2,4,8192] vs
    # local-cluster[8,4,8192]: real executor JVMs, VERDICT r03 next #6)
    master = os.environ.get("SEMLINK_BENCH_MASTER")
    if master:
        os.environ["SPARK_GRAFT_MASTER"] = master
        spark = get_spark("semlink-bench", cores=None,
                          shuffle_partitions=cpus,
                          extra={"spark.executor.memory":
                                 os.environ.get("SEMLINK_EXECUTOR_MEM", "6g")})
        # separate executor JVMs spawn their own Python workers, which
        # don't inherit the driver's sys.path — ship the engine the
        # same way spark-submit --py-files does
        # ALWAYS rebuild (~1 s): a cached zip would silently ship stale
        # engine code to executors after a source edit, measuring code
        # that no longer matches the repo
        repo = os.path.dirname(os.path.abspath(__file__))
        import subprocess
        subprocess.run(["sh", os.path.join(repo, "tools",
                                           "make_pyfiles.sh")], check=True)
        spark.sparkContext.addPyFile(os.path.join(repo, "semlink.zip"))
    else:
        spark = get_spark("semlink-bench", cores=cpus,
                          shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from semlink.queries import REGISTRY

    bench_fx = ensure_bench_fixture(spark)

    times: dict[str, float] = {}
    total = 0.0
    # scaling runs time ONLY the e2e pipeline (compute-dominated at high
    # REPLICAS); the headline loop is fixed-cost noise for that purpose
    headline = [] if os.environ.get("SEMLINK_BENCH_PIPELINE_ONLY") else HEADLINE
    for name in headline:
        fn, _sql = REGISTRY[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt

    # headline: the full record-linkage pipeline at bench scale
    from semlink.config import SemlinkConfig
    from semlink.pipeline import run_pipeline
    t = spark.read.parquet(os.path.join(bench_fx, "transcripts.parquet"))
    anchors = spark.read.parquet(os.path.join(bench_fx, "anchors.parquet"))
    pl = spark.read.parquet(os.path.join(bench_fx, "page_links.parquet"))
    n_turns = t.count()

    ckpt = os.path.join(BENCH_DIR, f"ckpt_{cpus}")
    # SEMLINK_BENCH_SCALE_MODE=1 flips the pipeline into the documented
    # 100 TB regime (no broadcast hints; rel semi-join-reduced, AQE
    # shuffle joins) — used to compare regimes under multi-executor
    # local-cluster masters where per-executor broadcast replication
    # over one shared memory bus is the binding cost
    scale_mode = bool(os.environ.get("SEMLINK_BENCH_SCALE_MODE"))
    cfg = SemlinkConfig(checkpoint_dir=ckpt, shuffle_partitions=cpus,
                        broadcast_dictionary=not scale_mode,
                        broadcast_context_tables=not scale_mode)
    # optional JVM warmup for scaling runs: one untimed pipeline pass
    # over a DIFFERENT (smaller) fixture first (codegen+JIT compile
    # ~35 s serial-ish — measured; it otherwise lands inside the timed
    # window at BOTH widths and depresses the efficiency ratio; a
    # long-lived cluster job is warm). The warmup MUST NOT use the
    # timed input: Spark's CacheManager matches persisted plans by
    # CANONICALIZED form, so an identical warmup run would serve the
    # timed pass from cache (measured: fake 207k turns/s). Different
    # data + clearCache() ⇒ the timed run recomputes everything.
    if os.environ.get("SEMLINK_BENCH_WARMUP"):
        global REPLICAS
        saved = REPLICAS
        REPLICAS = max(2, saved // 10)
        warm_fx = ensure_bench_fixture(spark)
        REPLICAS = saved
        run_pipeline(
            spark.read.parquet(os.path.join(warm_fx, "transcripts.parquet")),
            spark.read.parquet(os.path.join(warm_fx, "anchors.parquet")),
            spark.read.parquet(os.path.join(warm_fx, "page_links.parquet")),
            cfg, ckpt_dir=os.path.join(BENCH_DIR, f"warm_{cpus}"))
        spark.catalog.clearCache()
    t0 = time.time()
    res = run_pipeline(t, anchors, pl, cfg, ckpt_dir=ckpt)
    n_clusters = res["assignments"].select("cluster_id").distinct().count()
    dt = time.time() - t0
    times["pipeline_e2e"] = round(dt, 3)
    total += dt

    out = {
        "metric": "semlink headline queries + e2e record-linkage pipeline",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None,
        "cpus": cpus,
        "new_queries": [q for q in NEW_QUERIES if q in times],
        "pipeline_turns": n_turns,
        "pipeline_clusters": n_clusters,
        "pipeline_turns_per_sec": round(n_turns / dt, 1),
        "pipeline_stages": {s: round(t, 2)
                            for _r, s, t in res["metrics"]._stage_rows},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
