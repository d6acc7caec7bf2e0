"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exactness baseline. JVM-side
  F.aggregate/zip_with arithmetic — no Python in the loop. Quadratic;
  at scale use it only within partitions/cells.
- IVF-style cell-restricted top-k: restrict candidates to the query's
  coarse cell (here the `label` column stands in for a learned
  centroid assignment — at 100 TB you'd k-means the corpus, store the
  cell id as a column, and this exact plan shape applies: co-partition
  by cell, search within cell).
- Cosine near-dup edges: threshold instead of top-k.

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
    machinery as record linkage)."""
    sim = cosine_expr("q_emb", "c_emb")
    return (queries.crossJoin(embeddings)
            .filter(F.col("query_id") < F.col("cand_id"))
            .withColumn("sim", sim)
            .filter(F.col("sim") >= threshold)
            .select(F.col("query_id").alias("src"),
                    F.col("cand_id").alias("dst"),
                    F.round(F.col("sim") * 1_000_000).cast("bigint").alias("sim6")))
