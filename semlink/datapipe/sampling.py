"""Deterministic corpus sampling (training-data curation primitives).

A 100 TB curation pipeline samples constantly — per-language/source
quotas, eval holdouts, inspection slices — and the samples must be
REPRODUCIBLE across runs and engines (no rand(): seed plumbing breaks
resume and no SQL oracle could re-derive the rows). The primitive here
ranks rows within each stratum by md5 of their id — a uniform,
engine-portable pseudo-order — and keeps the first n.

Scale shape: one shuffle on the stratum key for the window; md5 ranks
are uniform so quota-capped output per stratum is balanced. A stratum
far larger than a partition still sorts only within its own partitions
(Spark window sort spills); for pathological single-stratum corpora,
pre-split the stratum key (salting) exactly as for any hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(df: DataFrame, strata_col: str, n_per_stratum: int,
                      id_col: str = "doc_id",
                      keep_rank: bool = False) -> DataFrame:
    """Deterministic n-per-stratum sample.

    Rank = row_number over (stratum, ORDER BY md5(id), id) — the md5
    pseudo-order is uniform and identical in any engine that speaks
    md5 (the DuckDB oracle re-derives the exact row set); the raw id
    tiebreak covers md5 collisions. ``keep_rank`` retains the
    within-stratum rank column (`sample_rk`).
    """
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col))
    out = (df.withColumn("sample_rk", F.row_number().over(w))
           .filter(F.col("sample_rk") <= n_per_stratum))
    return out if keep_rank else out.drop("sample_rk")


def token_budget_sample(df: DataFrame, strata_col: str,
                        budget_tokens: int, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Deterministic per-stratum sample capped by TOKEN mass, not row
    count — the data-mixing primitive ("x billion tokens per language
    / source") a training corpus is actually assembled with.

    Docs are admitted in the stratum's md5(id) pseudo-order while the
    budget is unexhausted BEFORE them (``cum_tokens - tok_count <
    budget``), so the sample overshoots by at most one document — the
    standard greedy quota cut, reproducible across engines (the oracle
    re-derives the exact row set; no rand()).

    Token counts are whitespace tokens (the family-wide tokenizer,
    null==''). Scale shape: one shuffle on the stratum key for the
    running-sum window; see :func:`stratified_sample` on hot-stratum
    salting.
    """
    from .dedup import _tokens
    toks = _tokens(F.coalesce(F.col(text_col), F.lit("")))
    w = (Window.partitionBy(strata_col)
         .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("tok_count", F.size(toks).cast("bigint"))
            .withColumn("cum_tokens", F.sum("tok_count").over(w))
            .filter(F.col("cum_tokens") - F.col("tok_count")
                    < budget_tokens)
            .select(id_col, strata_col, "tok_count", "cum_tokens"))
