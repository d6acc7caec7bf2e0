"""N-gram language-model quality scoring (training-data curation).

The public CCNet recipe (Wenzek et al. '20) and its descendants rank
web documents by the perplexity of a language model trained on a clean
corpus — fluent text scores low, boilerplate/gibberish high — and keep
the low-perplexity head. This module is that signal with the LM
trained ON the corpus itself (self-perplexity), the degenerate but
fully-distributed case: an add-one-smoothed token-bigram model

    p(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V)

where c(·) are corpus-wide counts over bigram positions, and V is the
corpus vocabulary size. Per document we report the bigram count and
the mean negative log-likelihood (avg NLL == log-perplexity).

Determinism across engines (the oracle-parity conventions):

- every per-bigram term is quantized to a scaled bigint
  round(-ln(p) * 1e6) BEFORE aggregation (pairs.py's idf6 pattern), so
  the per-doc sums are exact integer arithmetic — no float-summation
  order dependence between Spark partial aggregates and DuckDB;
- the mean is integer floor division of two bigints (`div`), not a
  float divide;
- ln() is evaluated on the SAME expression shape both sides
  (the Milne-Witten relatedness precedent).

Scale shape: ONE posexplode of the corpus tokens; bigrams via a lead
window partitioned by document (the mention n-gram generator's
measured shape — one shuffle on the doc id); c2/c1 are map-side-
combined groupBys on uniform token keys; V is a 1-row broadcast
crossJoin; the scoring join is equi on the bigram key (skew = a hot
bigram like "of the" — bounded by corpus Zipf, and AQE skew-join
splits it; the count tables themselves never collect anywhere).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _tokens

SCALE = 1_000_000


def doc_bigrams(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, w1, w2): every adjacent token pair, one row per OCCURRENCE
    (position order; docs with < 2 tokens emit nothing). Null text
    follows the family-wide null=='' convention (no tokens)."""
    d = df.select(F.col(id_col),
                  _tokens(F.coalesce(F.col(text_col), F.lit("")))
                  .alias("_t"))
    rows = d.select(id_col, F.size("_t").alias("_n"),
                    F.posexplode("_t").alias("_pos", "w1"))
    w = Window.partitionBy(id_col).orderBy("_pos")
    return (rows.withColumn("w2", F.lead("w1", 1).over(w))
            .filter(F.col("_pos") + 2 <= F.col("_n"))
            .select(F.col(id_col), "w1", "w2"))


def with_lm_nll(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document self-perplexity under the corpus bigram LM.

    Output: (id, n_bigrams, nll6_sum, nll6_avg) — nll6_* in the
    scaled-bigint convention (1e-6 nats); docs with < 2 tokens are
    excluded (no transitions to score)."""
    bg = doc_bigrams(df, id_col, text_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    toks = df.select(
        F.explode(_tokens(F.coalesce(F.col(text_col), F.lit(""))))
        .alias("tok"))
    v = toks.agg(F.countDistinct("tok").alias("v"))
    term = (bg.join(c2, ["w1", "w2"]).join(c1, "w1").crossJoin(v)
            .select(
                F.col(id_col),
                F.round(-F.log((F.col("c2") + 1).cast("double")
                               / (F.col("c1") + F.col("v"))
                               .cast("double")) * SCALE)
                .cast("bigint").alias("nll6")))
    return (term.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum("nll6").cast("bigint").alias("nll6_sum"))
            .withColumn("nll6_avg",
                        F.expr("nll6_sum div n_bigrams").cast("bigint")))
