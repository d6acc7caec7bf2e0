"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exactness baseline. JVM-side
  F.aggregate/zip_with arithmetic — no Python in the loop. Quadratic;
  at scale use it only within partitions/cells.
- IVF: a REAL coarse quantizer — deterministic seeds (the k lowest-id
  vectors, oracle-expressible) optionally Lloyd-refined by distributed
  k-means (``kmeans_centroids``); ``assign_cells`` probes the nprobe
  nearest centroids per vector; ``ivf_topk`` searches within cells.
  At 100 TB: centroids are a broadcast dim (k·dim doubles), assignment
  is one scan, the search shuffle is keyed by cell (co-partitionable).
- Cosine near-dup edges: threshold instead of top-k; the scale path is
  ``cosine_near_dup_edges_ivf`` (Σ|cell|² work, not N²).

All ranking uses scaled-bigint similarity + id tiebreaks so results
are deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a: str, b: str) -> Column:
    """Cosine similarity of two array<float/double> columns, computed
    in double, JVM-side."""
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.col(a), F.lit(0.0),
                            lambda acc, x: acc + x.cast("double") * x.cast("double")))
    nb = F.sqrt(F.aggregate(F.col(b), F.lit(0.0),
                            lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def _ranked_topk(joined: DataFrame, k: int) -> DataFrame:
    sim6 = F.round(cosine_expr("q_emb", "c_emb") * 1_000_000).cast("bigint")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim6"), F.asc("cand_id"))
    return (joined.withColumn("sim6", sim6)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "cand_id", "sim6", "rk"))


def brute_force_topk(embeddings: DataFrame, queries: DataFrame,
                     k: int = 5) -> DataFrame:
    """queries(query_id, q_emb) × embeddings(cand_id, c_emb) → top-k.

    The cross join is intentional and the caller bounds |queries|; at
    scale the candidate side is pre-filtered (IVF cell / LSH bucket).
    """
    joined = (queries.crossJoin(embeddings)
              .filter(F.col("query_id") != F.col("cand_id")))
    return _ranked_topk(joined, k)


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Cell-restricted top-k: candidates share the query's coarse cell.
    Join key = cell → candidate set shrinks by the cell count; the
    shuffle is on cell (co-partitionable)."""
    joined = (queries.join(embeddings, "cell")
              .filter(F.col("query_id") != F.col("cand_id")))
    return _ranked_topk(joined, k)


def cosine_near_dup_edges(embeddings: DataFrame, queries: DataFrame,
                          threshold: float = 0.95) -> DataFrame:
    """Near-duplicate edges by cosine ≥ threshold (feeds the same CC
    machinery as record linkage). EXACT baseline: the cross join is N²
    — fixture/verification scale only; production uses
    :func:`cosine_near_dup_edges_ivf`."""
    sim = cosine_expr("q_emb", "c_emb")
    return (queries.crossJoin(embeddings)
            .filter(F.col("query_id") < F.col("cand_id"))
            .withColumn("sim", sim)
            .filter(F.col("sim") >= threshold)
            .select(F.col("query_id").alias("src"),
                    F.col("cand_id").alias("dst"),
                    F.round(F.col("sim") * 1_000_000).cast("bigint").alias("sim6")))


# --------------------------------------------------------------- IVF index

def seed_centroids(embeddings: DataFrame, k: int = 8,
                   id_col: str = "vec_id",
                   emb_col: str = "embedding") -> DataFrame:
    """Deterministic coarse-quantizer seeds: the k lowest-id vectors,
    numbered 0..k-1 in id order. Oracle-expressible (ORDER BY id LIMIT k)
    and the fixed starting point for :func:`kmeans_centroids`. The
    order-by-limit is Spark's distributed TakeOrdered — no global sort."""
    w = Window.orderBy(id_col)  # k rows only — single tiny partition is fine
    return (embeddings.select(id_col, emb_col).orderBy(id_col).limit(k)
            .select((F.row_number().over(w) - 1).alias("cell"),
                    F.transform(emb_col, lambda x: x.cast("double"))
                    .alias("c_emb")))


def assign_cells(df: DataFrame, centroids: DataFrame, id_col: str,
                 nprobe: int = 1, emb_col: str = "embedding") -> DataFrame:
    """Append `cell` to df: one row per (vector, probed cell), the nprobe
    nearest centroids by cosine. centroids(cell, c_emb) is broadcast —
    one scan over df, no shuffle besides the per-id window (partitioned
    by id, never global). Deterministic: scaled-bigint sim, cell-asc tie."""
    sim6 = F.round(cosine_expr(emb_col, "c_emb") * 1_000_000).cast("bigint")
    w = Window.partitionBy(id_col).orderBy(F.desc("_csim6"), F.asc("cell"))
    out = (df.crossJoin(F.broadcast(centroids))
           .withColumn("_csim6", sim6)
           .withColumn("_crk", F.row_number().over(w))
           .filter(F.col("_crk") <= nprobe)
           .drop("c_emb", "_csim6", "_crk"))
    return out


def kmeans_centroids(embeddings: DataFrame, k: int = 8, iters: int = 4,
                     id_col: str = "vec_id",
                     emb_col: str = "embedding") -> DataFrame:
    """Distributed Lloyd refinement of :func:`seed_centroids` → the real
    IVF coarse quantizer. Assignment is a broadcast crossJoin scan; the
    centroid update is a posexplode + groupBy(cell, pos) partial-agg
    (map-side combine) — both fully distributed; only the k·dim centroid
    matrix ever reaches the driver (re-literalized each iteration as a
    hard lineage cut).

    Deterministic: elementwise means are computed over scaled-bigint
    sums (associative across partitions, unlike double sums), so the
    centroids are bit-identical run to run. Empty cells keep their
    previous centroid."""
    spark = embeddings.sparkSession
    cur = seed_centroids(embeddings, k, id_col, emb_col)
    cents = {r["cell"]: list(r["c_emb"]) for r in cur.collect()}
    e6 = F.lit(1_000_000.0)
    for _ in range(iters):
        cent_df = spark.createDataFrame(
            sorted(cents.items()), "cell int, c_emb array<double>")
        a = assign_cells(embeddings.select(id_col, emb_col), cent_df,
                         id_col, nprobe=1, emb_col=emb_col)
        upd = (a.select("cell", F.posexplode(emb_col).alias("pos", "x"))
               .groupBy("cell", "pos")
               .agg(F.sum(F.round(F.col("x").cast("double") * e6)
                          .cast("bigint")).alias("s"),
                    F.count(F.lit(1)).alias("n"))
               .withColumn("m", F.col("s").cast("double") / F.col("n") / e6)
               .groupBy("cell")
               .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
                    .alias("pm"))
               .select("cell", F.col("pm.m").alias("c_emb")))
        for r in upd.collect():
            cents[r["cell"]] = list(r["c_emb"])
    return spark.createDataFrame(
        sorted(cents.items()), "cell int, c_emb array<double>")


def cosine_near_dup_edges_ivf(embeddings: DataFrame, centroids: DataFrame,
                              threshold: float = 0.95, nprobe: int = 2,
                              id_col: str = "vec_id",
                              emb_col: str = "embedding") -> DataFrame:
    """Near-dup edges restricted to IVF cells — the 100 TB path. Every
    vector is indexed under its nprobe nearest cells, so a pair meets
    iff their probe sets intersect: near-identical vectors share the
    top cell by construction, and boundary pairs are caught by the
    second probe. Work is Σ_cell |cell|² instead of N²; the join
    shuffles on cell only."""
    a = assign_cells(embeddings.select(id_col, emb_col), centroids,
                     id_col, nprobe=nprobe, emb_col=emb_col)
    l = a.select(F.col(id_col).alias("query_id"),
                 F.col(emb_col).alias("q_emb"), "cell")
    r = a.select(F.col(id_col).alias("cand_id"),
                 F.col(emb_col).alias("c_emb"), "cell")
    sim = cosine_expr("q_emb", "c_emb")
    return (l.join(r, "cell")
            .filter(F.col("query_id") < F.col("cand_id"))
            .dropDuplicates(["query_id", "cand_id"])  # multi-probe meets
            .withColumn("sim", sim)
            .filter(F.col("sim") >= threshold)
            .select(F.col("query_id").alias("src"),
                    F.col("cand_id").alias("dst"),
                    F.round(F.col("sim") * 1_000_000).cast("bigint")
                    .alias("sim6")))
