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
