"""N-gram mention generation (SURVEY T3) — pure SQL explode, no Python.

For each row of text we emit every word n-gram of length 1..N with its
token-span (span_start = 0-based token index, span_len = token count).
This is the reference's candidate-mention generator
(`Semanticizer.semanticize`: tokenize → n-grams ≤ max_ngram_length →
normalize → probe), recast as a single generator expression that
whole-stage codegen keeps JVM-side.

Scale note: output is ≤ N× the token count of the corpus — linear, no
shuffle. The explode happens in the same stage as the parquet scan, so
column pruning means only (keys, text) are ever read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textnorm import normalize_expr, tokenize_expr


def ngram_struct_expr(tokens_col: str, max_n: int) -> Column:
    """Array<struct(span_start, span_len, ngram)> of all 1..max_n grams.

    Guarded for empty token arrays (sequence(0,-1) would descend).
    """
    return F.expr(
        f"""
        CASE WHEN size({tokens_col}) = 0 THEN
          CAST(array() AS array<struct<span_start:int,span_len:int,ngram:string>>)
        ELSE
          flatten(transform(sequence(0, size({tokens_col}) - 1), i ->
            transform(sequence(1, least({max_n}, size({tokens_col}) - i)), n ->
              struct(i AS span_start,
                     n AS span_len,
                     array_join(slice({tokens_col}, i + 1, n), ' ') AS ngram))))
        END
        """
    )


def explode_mentions(
    df: DataFrame,
    text_col: str = "text",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    max_n: int = 3,
) -> DataFrame:
    """transcripts → mentions(key_cols..., mention_id, span_start,
    span_len, ngram, ngram_norm).

    mention_id = "<key0>:<key1>:<span_start>:<span_len>" — deterministic,
    no monotonically_increasing_id (which is partition-layout dependent
    and would break resume determinism).
    """
    toks = df.select(*key_cols, tokenize_expr(F.col(text_col)).alias("_toks"))
    m = (
        toks.select(
            *key_cols,
            F.explode(ngram_struct_expr("_toks", max_n)).alias("g"),
        )
        .select(
            *key_cols,
            F.col("g.span_start").alias("span_start"),
            F.col("g.span_len").alias("span_len"),
            F.col("g.ngram").alias("ngram"),
        )
        .withColumn("ngram_norm", normalize_expr(F.col("ngram")))
        .filter(F.col("ngram_norm") != "")
    )
    id_parts = [F.col(c).cast("string") for c in key_cols] + [
        F.col("span_start").cast("string"),
        F.col("span_len").cast("string"),
    ]
    return m.withColumn("mention_id", F.concat_ws(":", *id_parts))


def ngram_duckdb_sql(table: str, id_cols: str, text_col: str, max_n: int) -> str:
    """DuckDB-equivalent n-gram explode (oracle for T3).

    Spans are 0-based to match explode_mentions.
    """
    return f"""
    SELECT {id_cols},
           i - 1            AS span_start,
           n                AS span_len,
           array_to_string(toks[i : i + n - 1], ' ') AS ngram
    FROM (
      SELECT {id_cols},
             list_filter(string_split_regex(trim({text_col}), '\\s+'),
                         x -> x <> '') AS toks
      FROM {table}
    ) t,
    LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) gi,
    LATERAL (SELECT unnest(generate_series(1, least({max_n}, len(toks) - i + 1))) AS n) gn
    """
