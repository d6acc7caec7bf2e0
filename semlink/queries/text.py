"""Text analysis (datapipe): language ID, token stats, quality
score, fingerprints, TF-IDF top terms."""
from __future__ import annotations

from pyspark.sql import functions as F

from ..datapipe import textstats as ts
from . import SCALE, _docs, _r6, q


_STOP_IN = ", ".join(f"'{w}'" for w in ts.EN_STOPWORDS)

_STOPR_SQL = f"""
  CAST(len(list_filter(toks, x -> x IN ({_STOP_IN}))) AS DOUBLE)
  / CASE WHEN len(toks) > 0 THEN len(toks) ELSE 1 END
"""

_PROF_VALUES = ", ".join(
    f"('{tok}', '{lang}')"
    for lang, words in sorted(ts.LANG_STOPWORDS.items())
    for tok in sorted(set(words)))

@q("text_langid", f"""
  WITH base AS (SELECT doc_id, lang, coalesce(text, '') AS t FROM documents),
  toks AS (SELECT doc_id,
                  unnest(list_filter(string_split_regex(trim(t), ' +'),
                                     x -> x <> '')) AS tok
           FROM base),
  n AS (SELECT doc_id, count(*) AS _n FROM toks GROUP BY doc_id),
  prof(tok, plang) AS (VALUES {_PROF_VALUES}),
  hits AS (SELECT doc_id, plang, count(*) AS _h
           FROM toks JOIN prof USING (tok) GROUP BY doc_id, plang),
  stop_scores AS (SELECT h.doc_id, h.plang,
                         CAST(ROUND(CAST(_h AS DOUBLE) / greatest(_n, 1)
                                    * {SCALE}) AS BIGINT) AS score6
                  FROM hits h JOIN n USING (doc_id)),
  cjk AS (SELECT doc_id, 'cjk' AS plang,
                 CAST(ROUND(least(1.0,
                        CAST(strlen(t) - length(t) AS DOUBLE)
                        / (2.0 * greatest(length(t), 1))) * {SCALE})
                      AS BIGINT) AS score6
          FROM base),
  scores AS (SELECT * FROM stop_scores UNION ALL SELECT * FROM cjk),
  top AS (SELECT doc_id, plang, score6,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score6 DESC, plang ASC) AS rk
          FROM scores)
  SELECT b.doc_id, b.lang,
         CASE WHEN t2.score6 >= {ts.LANG_MIN_SCORE6} THEN t2.plang
              ELSE 'und' END AS lang_pred,
         coalesce(t2.score6, 0) AS top_score6
  FROM base b LEFT JOIN (SELECT * FROM top WHERE rk = 1) t2 USING (doc_id)
""")
def text_langid(spark, sf_dir):
    """Profile-based language ID (VERDICT r03 next #5): stopword-density
    argmax over the broadcast LANG_STOPWORDS dimension + the CJK
    byte-excess channel; the oracle re-derives the entire scoring
    (profile VALUES, density ratios, argmax window, 'und' threshold)
    in DuckDB."""
    d = _docs(spark, sf_dir)
    r = ts.lang_id(d)
    return (d.select("doc_id", "lang").join(r, "doc_id")
            .select("doc_id", "lang", "lang_pred", "top_score6"))


@q("text_token_stats", f"""
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(text), ' +'), x -> x <> ''))
           AS ws_tokens,
         len(regexp_extract_all(text, '{ts.WORD_RE}')) AS word_tokens,
         length(text) AS n_chars_out
  FROM documents
""")
def text_token_stats(spark, sf_dir):
    d = ts.with_token_stats(_docs(spark, sf_dir).drop("n_chars"))
    return d.select("doc_id", "ws_tokens", "word_tokens",
                    F.col("n_chars").alias("n_chars_out"))


@q("text_quality_score", f"""
  SELECT doc_id,
         CAST(ROUND((
           0.4 * least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0)
         + 0.3 * (CASE WHEN length(text) > 0 THEN
             CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
             / length(text) ELSE 0.0 END)
         + 0.3 * least(({_STOPR_SQL}) * 3.0, 1.0)
         ) * {SCALE}) AS BIGINT) AS quality6
  FROM (SELECT doc_id, text,
               list_filter(string_split_regex(trim(text), ' +'),
                           x -> x <> '') AS toks
        FROM documents)
""")
def text_quality_score(spark, sf_dir):
    d = ts.with_quality_score(_docs(spark, sf_dir).drop("n_chars"))
    return d.select("doc_id", _r6(F.col("quality_score")).alias("quality6"))


@q("text_fingerprints", """
  SELECT doc_id,
         md5(regexp_replace(lower(trim(coalesce(text, ''))), ' +', ' ', 'g'))
           AS fp_exact,
         list_min(CASE WHEN len(toks) >= 4 THEN
             list_transform(generate_series(1, len(toks) - 3),
                            i -> md5(array_to_string(toks[i : i + 3], ' ')))
           ELSE [md5(array_to_string(toks, ' '))] END) AS fp_min_shingle
  FROM (SELECT doc_id, text,
               list_filter(string_split_regex(trim(text), ' +'),
                           x -> x <> '') AS toks
        FROM documents)
""")
def text_fingerprints(spark, sf_dir):
    d = ts.with_fingerprints(_docs(spark, sf_dir))
    return d.select("doc_id", "fp_exact", "fp_min_shingle")


@q("text_tfidf_top_terms", f"""
  WITH toks AS (
    SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), ' +'),
                                      x -> x <> '')) AS term
    FROM documents),
  tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         FROM toks GROUP BY 1, 2),
  dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
  nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
  scored AS (
    SELECT t.doc_id, t.term, t.tf, d.df_t,
           CAST(ROUND(CAST(t.tf AS DOUBLE) * ln(n / d.df_t) * {SCALE})
                AS BIGINT) AS tfidf6
    FROM tf t JOIN dfq d USING (term), nd)
  SELECT doc_id, term, tf, df_t, tfidf6, rk FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf6 DESC, term) AS rk
    FROM scored)
  WHERE rk <= 5
""")
def text_tfidf_top_terms(spark, sf_dir):
    """Training-data keyword extraction: per-document top-5 terms by
    TF-IDF (textstats.tfidf_top_terms), rank and score hash-gated."""
    return ts.tfidf_top_terms(_docs(spark, sf_dir), k=5)
