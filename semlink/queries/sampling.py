"""Stratified sampling (datapipe)."""
from __future__ import annotations

from . import q, _docs


@q("sample_stratified", """
  SELECT doc_id, lang, sample_rk FROM (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                       doc_id) AS sample_rk
    FROM documents)
  WHERE sample_rk <= 20
""")
def sample_stratified(spark, sf_dir):
    """Deterministic per-stratum sampling (datapipe.sampling): 20 docs
    per language, ranked by md5(id) — reproducible across runs and
    engines, no rand(); the oracle re-derives the exact row set."""
    from ..datapipe.sampling import stratified_sample
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    return stratified_sample(d, "lang", 20, keep_rank=True)


_BUDGET = 1000  # tokens per language


@q("sample_token_budget", f"""
  SELECT doc_id, lang, tok_count, cum_tokens FROM (
    SELECT doc_id, lang, tok_count,
           CAST(sum(tok_count) OVER (
             PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_tokens
    FROM (SELECT doc_id, lang,
                 CAST(len(list_filter(
                   string_split_regex(trim(coalesce(text, '')), ' +'),
                   x -> x <> '')) AS BIGINT) AS tok_count
          FROM documents))
  WHERE cum_tokens - tok_count < {_BUDGET}
""")
def sample_token_budget(spark, sf_dir):
    """Token-budget quota sampling (datapipe.sampling): admit docs per
    language in md5(id) pseudo-order until the _BUDGET token cut — the
    data-mixing cut, exact-row-set reproducible in both engines.
    Registry + pytest + oracle verified on demand; demoted from the
    driver window (see __spark_entry__)."""
    from ..datapipe.sampling import token_budget_sample
    return token_budget_sample(_docs(spark, sf_dir), "lang", _BUDGET)
