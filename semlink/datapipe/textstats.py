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

_LETTERS = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
            "abcdefghijklmnopqrstuvwxyz")
_DIGITS = "0123456789"


def _tokens(col: Column) -> Column:
    return F.array_remove(F.split(F.trim(col), r" +"), "")


def _collapse_runs(col: Column, ch: str) -> Column:
    """Collapse maximal runs of ``ch`` to a single occurrence,
    regex-free: 6 halving replace passes handle runs ≤ 64; rows still
    carrying a pair (a >64-char run — pathological) take the regexp
    fixpoint. Same shape as textnorm._collapse_spaces."""
    pair = ch + ch
    for _ in range(6):
        col = F.replace(col, F.lit(pair), F.lit(ch))
    return F.when(F.contains(col, F.lit(pair)),
                  F.regexp_replace(col, ch + "+", ch)).otherwise(col)


def _count_char(col: Column, ch: str) -> Column:
    return F.length(col) - F.length(F.translate(col, ch, ""))


def word_token_count(col: Column) -> Column:
    """Regex-free count of maximal [A-Za-z]+ and [0-9]+ runs: classify
    letters→'a' and digits→'0' with translate (any other char breaks a
    run, exactly like the regex), collapse runs with bounded replace
    passes, then count survivors by translate-deletion length diff.

    MEASURED NEGATIVE RESULT (round 4, tools/datapipe_scaling.py
    'wordtok' cell, 1M docs): regexp_extract_all beats this chain at
    BOTH widths (regex 5.2 s@8 / 4.3 s@32 vs 8.3 / 5.6) — the
    thread-serialization cliff is regexp_replace-specific and
    extract_all scales like every other expression on this host
    (eff 0.30 vs 0.37). Kept as the documented alternative if a
    substrate ever serializes extract_all; with_token_stats uses the
    regex."""
    cls = F.translate(F.translate(col, _LETTERS, "a" * len(_LETTERS)),
                      _DIGITS, "0" * len(_DIGITS))
    collapsed = _collapse_runs(_collapse_runs(cls, "a"), "0")
    return _count_char(collapsed, "a") + _count_char(collapsed, "0")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish word/number pieces
    (regexp_extract_all — measured faster than the translate-classify
    chain at both 8 and 32 cores; see word_token_count)."""
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
    """Cheap shuffle-free en-vs-other heuristic (English-stopword
    density). Kept as the zero-shuffle prefilter; the real per-language
    identifier is :func:`lang_id` below."""
    d = with_stopword_ratio(df, text_col)
    return d.withColumn(
        "lang_guess",
        F.when(F.col("stop_ratio") >= threshold, F.lit("en")).otherwise(F.lit("other")))


# Per-language stopword profiles (public-knowledge high-frequency
# function words). A token may legitimately belong to several profiles
# ("de" is French AND Spanish) — the profile table holds one row per
# (token, lang) and densities disambiguate. Shared verbatim with the
# DuckDB oracle (queries.py builds the VALUES list from this dict).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": EN_STOPWORDS,
    "de": ("der die das und ist von zu mit den im für auf des nicht "
           "ein eine als auch es an aus er sie nach wird bei einem "
           "einer dem war sind oder wie").split(),
    "fr": ("le la les de des du et est un une dans que pour sur avec "
           "ne pas au aux ce cette par plus ou mais comme il elle "
           "nous vous sont été je").split(),
    "es": ("el la los las de del y es un una en que para por con no "
           "se al lo como más pero sus ha este esta son fue muy ya "
           "entre cuando todo").split(),
}

LANG_MIN_SCORE6 = 50_000   # argmax below 5% density → 'und'


def lang_profile_table(spark) -> DataFrame:
    """(tok, lang) broadcast dimension built from LANG_STOPWORDS."""
    rows = [(tok, lang)
            for lang, words in sorted(LANG_STOPWORDS.items())
            for tok in sorted(set(words))]
    return spark.createDataFrame(rows, "tok string, lang string")


def lang_id(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text",
            min_score6: int = LANG_MIN_SCORE6) -> DataFrame:
    """Real language identification (VERDICT r03 next #5): per-language
    stopword-density scoring against a broadcast profile dimension,
    plus a CJK channel from UTF-8 byte-excess density — no UDFs, no
    regex, and the only shuffle is one map-side-combined
    groupBy(doc, lang).

    score(doc, lang)  = |stopword hits of lang| / |ws tokens|
    score(doc, 'cjk') = min(1, (octet_len − char_len) / (2·char_len))
      — CJK codepoints are 3 bytes in UTF-8 (2 excess bytes/char), so
      pure CJK text scores ~1 while accented Latin (2-byte chars)
      scores ≤ 0.5 and ASCII scores 0.

    Prediction = argmax over languages (ties: lang ascending); docs
    whose best score6 < ``min_score6`` come out 'und'. All ratios use
    the scaled-bigint convention; the DuckDB oracle re-derives the
    whole scoring (queries.py text_langid).

    Scale shape: explode → broadcast hash join on the ~150-row profile
    → partial-agg groupBy — the same measured-scalable shape as the
    dedup family; the CJK channel is pure codegen arithmetic on the
    base scan.
    """
    spark = df.sparkSession
    base = df.select(F.col(id_col),
                     F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    toks = base.select(id_col, F.explode(_tokens(F.col("_t"))).alias("tok"))
    n = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    prof = lang_profile_table(spark)
    hits = (toks.join(F.broadcast(prof), "tok")
            .groupBy(id_col, "lang").agg(F.count(F.lit(1)).alias("_h")))
    stop_scores = (hits.join(n, id_col)
                   .select(F.col(id_col), "lang",
                           F.round(F.col("_h").cast("double")
                                   / F.greatest(F.col("_n"), F.lit(1))
                                   * 1_000_000).cast("bigint")
                           .alias("score6")))
    chars = F.greatest(F.length("_t"), F.lit(1))
    cjk_scores = base.select(
        F.col(id_col), F.lit("cjk").alias("lang"),
        F.round(F.least(
            F.lit(1.0),
            (F.octet_length("_t") - F.length("_t")).cast("double")
            / (F.lit(2.0) * chars)) * 1_000_000).cast("bigint")
        .alias("score6"))
    scores = stop_scores.unionByName(cjk_scores)
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy(F.desc("score6"), F.asc("lang"))
    top = (scores.withColumn("_rk", F.row_number().over(w))
           .filter(F.col("_rk") == 1).drop("_rk"))
    return (df.select(id_col)
            .join(top, id_col, "left")
            .select(F.col(id_col),
                    F.when(F.coalesce(F.col("score6"), F.lit(0))
                           >= min_score6, F.col("lang"))
                    .otherwise(F.lit("und")).alias("lang_pred"),
                    F.coalesce(F.col("score6"), F.lit(0))
                    .cast("bigint").alias("top_score6")))


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length saturation + alpha purity + stopword
    balance, weighted. Deterministic, unit-interval."""
    t = F.col(text_col)
    d = with_token_stats(with_stopword_ratio(df, text_col), text_col)
    # count of [A-Za-z ] chars, regex-free: translate-DELETE the keep
    # set and take the length difference (regexp_replace is the
    # measured non-scaling expression on this substrate — BENCH §2)
    alpha_chars = F.length(t) - F.length(F.translate(t, _LETTERS + " ", ""))
    alpha_ratio = F.when(F.col("n_chars") > 0,
                         alpha_chars / F.col("n_chars")).otherwise(F.lit(0.0))
    len_sat = F.least(F.col("ws_tokens") / F.lit(50.0), F.lit(1.0))
    return d.withColumn(
        "quality_score",
        F.lit(0.4) * len_sat + F.lit(0.3) * alpha_ratio
        + F.lit(0.3) * F.least(F.col("stop_ratio") * 3.0, F.lit(1.0)))


def with_fingerprints(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      shingle: int = 4) -> DataFrame:
    """Document fingerprinting: exact md5 of the normalized text plus a
    winnowing-style min-hash over token shingles (the cheap near-dup
    prefilter).

    The min-shingle runs through the lambda-free exploded shingle
    generator (dedup.shingles_exploded) + one map-side-combined
    groupBy-min — the measured-scalable shape — instead of an HOF
    ``transform`` string lambda (thread-serialized, BENCH §2; the
    exploded rewrite was 2× faster for minhash at both widths). The
    whitespace collapse in fp_exact is the regex-free bounded-replace
    fold (regexp only on pathological >64-space runs)."""
    from .dedup import shingles_exploded
    # null text coalesces to '' — the family-wide null==empty convention
    # (shingles, streaming dedup, batch exact dedup); ADVICE r04
    t = F.coalesce(F.col(text_col), F.lit(""))
    norm = _collapse_runs(F.lower(F.trim(t)), " ")
    mins = (shingles_exploded(df, id_col, text_col, shingle)
            .groupBy(id_col)
            .agg(F.min(F.md5("s")).alias("fp_min_shingle")))
    return (df.withColumn("fp_exact", F.md5(norm))
            .join(mins, id_col, "left"))


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
