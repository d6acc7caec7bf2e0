"""Text analysis over document corpora: language-ID heuristic, quality
scoring, token counting, fingerprinting. All pure Spark SQL — these run
per-row over 100 TB, so everything stays inside whole-stage codegen
(no UDFs, no shuffles except the final stats aggregations a caller may
add).

Every function has a DuckDB-oracle twin in semlink/queries.py; float
outputs use the shared scaled-bigint convention (round(x*1e6)) so
cross-engine hashing is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny embedded English stopword list — shared verbatim with the SQL
# oracle; a real deployment broadcasts per-language dictionaries
EN_STOPWORDS = (
    "the a of to and in is was for on with at by from it that this "
    "be are as or an not".split()
)

WORD_RE = "[A-Za-z]+|[0-9]+"


def _tokens(col: Column) -> Column:
    return F.array_remove(F.split(F.trim(col), r" +"), "")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish word/number pieces."""
    t = F.col(text_col)
    return df.withColumns({
        "ws_tokens": F.size(_tokens(t)).cast("bigint"),
        "word_tokens": F.size(F.regexp_extract_all(t, F.lit(WORD_RE), 0)).cast("bigint"),
        "n_chars": F.length(t).cast("bigint"),
    })


def with_stopword_ratio(df: DataFrame, text_col: str = "text") -> DataFrame:
    toks = _tokens(F.col(text_col))
    stops = F.filter(toks, lambda x: x.isin(*EN_STOPWORDS))
    return df.withColumn(
        "stop_ratio",
        F.when(F.size(toks) > 0, F.size(stops) / F.size(toks)).otherwise(F.lit(0.0)))


def with_lang_guess(df: DataFrame, text_col: str = "text",
                    threshold: float = 0.12) -> DataFrame:
    """Language-ID heuristic: English-stopword density. (A production
    system swaps in per-language n-gram profiles — same plan shape:
    one scan, a handful of vectorized expressions, no shuffle.)"""
    d = with_stopword_ratio(df, text_col)
    return d.withColumn(
        "lang_guess",
        F.when(F.col("stop_ratio") >= threshold, F.lit("en")).otherwise(F.lit("other")))


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length saturation + alpha purity + stopword
    balance, weighted. Deterministic, unit-interval."""
    t = F.col(text_col)
    d = with_token_stats(with_stopword_ratio(df, text_col), text_col)
    alpha_chars = F.length(F.regexp_replace(t, r"[^A-Za-z ]", ""))
    alpha_ratio = F.when(F.col("n_chars") > 0,
                         alpha_chars / F.col("n_chars")).otherwise(F.lit(0.0))
    len_sat = F.least(F.col("ws_tokens") / F.lit(50.0), F.lit(1.0))
    return d.withColumn(
        "quality_score",
        F.lit(0.4) * len_sat + F.lit(0.3) * alpha_ratio
        + F.lit(0.3) * F.least(F.col("stop_ratio") * 3.0, F.lit(1.0)))


def with_fingerprints(df: DataFrame, text_col: str = "text",
                      shingle: int = 4) -> DataFrame:
    """Document fingerprinting: exact md5 of the normalized text plus a
    winnowing-style min-hash over token shingles (the cheap
    near-dup prefilter)."""
    t = F.col(text_col)
    norm = F.regexp_replace(F.lower(F.trim(t)), r" +", " ")
    toks = _tokens(t)
    n = F.size(toks)
    shingles = F.when(
        n >= shingle,
        F.transform(
            F.sequence(F.lit(0), n - shingle),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, shingle)))),
    ).otherwise(F.array(F.md5(F.concat_ws(" ", toks))))
    return df.withColumns({
        "fp_exact": F.md5(norm),
        "fp_min_shingle": F.array_min(shingles),
    })


def tfidf_top_terms(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 5) -> DataFrame:
    """Per-document top-k terms by TF-IDF — the classic corpus-keyword
    extractor a training-data pipeline runs before filtering/labeling.

    tf = term count within the doc; idf = ln(N / df_t) with df_t the
    number of docs containing the term. Ranking and the emitted score
    use the scaled-bigint convention (tfidf6) so ordering and values
    are engine-exact; ties break on term ascending.

    Scale shape: explode → groupBy(doc, term) (map-side combined) →
    groupBy(term) for document frequency (one row per (doc, term)
    entering, so count(*) IS the document frequency) → broadcast-style
    1-row N cross join (lazy, like the MW n_pages count) → per-doc
    window top-k. No collects, no skew keys beyond natural term
    frequency (the tf aggregate combines before the shuffle).
    """
    from pyspark.sql import Window
    toks = df.select(F.col(id_col),
                     F.explode(_tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    nd = df.select(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (tf.join(dfq, "term")
              .crossJoin(F.broadcast(nd))
              .withColumn(
                  "tfidf6",
                  F.round(F.col("tf").cast("double")
                          * F.log(F.col("n_docs") / F.col("df_t"))
                          * 1_000_000).cast("bigint")))
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf6"), F.asc("term"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(F.col(id_col), "term",
                    F.col("tf").cast("bigint").alias("tf"),
                    F.col("df_t").cast("bigint").alias("df_t"),
                    "tfidf6", "rk"))
