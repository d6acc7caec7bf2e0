"""Text cleaning, tokenization and surface-form normalization
(SURVEY T1-T5). All pure Spark SQL expressions — zero Python UDFs.

``normalize_expr`` produces THE blocking key. It must be byte-identical
between the dictionary-build side and the query side (SURVEY §7.3 item 3),
and — for the DuckDB oracle — reproducible as
``lower(strip_accents(...))`` + regexes in ANSI SQL. Golden unit pairs in
tests/test_textnorm.py pin the behavior.

Reference semantics: the public semanticizer normalizes surface forms
with configurable levels `dash`, `accents`, `lower` before probing the
anchor store (its wpm utils). We add punctuation stripping +
whitespace collapse so transcript text (which, unlike wiki anchors,
contains arbitrary punctuation) blocks robustly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Latin accent fold map (NFKD base-letter extraction for the Latin-1
# Supplement + Latin Extended-A/B ranges our fixtures exercise), built
# deterministically at import time. A JVM-side translate() keeps folding
# out of Python; full Unicode folding would be the one place a vectorized
# pandas UDF (unicodedata.normalize on a Series) is justified — not
# needed for ASCII corpora. Non-decomposable letters (Ø, ß, Þ…) fall
# through to the punctuation strip on BOTH the Spark and DuckDB sides.
import unicodedata as _ud

_src, _dst = [], []
for _cp in range(0xC0, 0x250):
    _ch = chr(_cp)
    _base = "".join(c for c in _ud.normalize("NFKD", _ch)
                    if not _ud.combining(c))
    if len(_base) == 1 and _base != _ch and _base.isascii() and _base.isalpha():
        _src.append(_ch)
        _dst.append(_base)
_ACC_SRC = "".join(_src)
_ACC_DST = "".join(_dst)
del _src, _dst, _cp, _ch, _base

_DASHES = "-‐‑‒–—―"


def clean_expr(col: Column) -> Column:
    """T1: strip URLs, @mentions, RT markers (the reference's tweet
    preprocessing) from free text."""
    c = F.regexp_replace(col, r"https?://\S+", " ")
    c = F.regexp_replace(c, r"@\w+", " ")
    c = F.regexp_replace(c, r"\bRT\b", " ")
    return c


def fold_accents_expr(col: Column) -> Column:
    return F.translate(col, _ACC_SRC, _ACC_DST)


def normalize_expr(col: Column) -> Column:
    """T4 — the blocking key: dash→space, fold accents, lowercase,
    strip non-alnum, collapse whitespace, trim.

    DuckDB oracle equivalent (must stay in sync — see oracle_sql()):
      trim(regexp_replace(regexp_replace(lower(strip_accents(
        regexp_replace(s,'[-‐-―]',' ','g'))),'[^a-z0-9 ]','','g'),' +',' ','g'))
    """
    c = F.translate(col, _DASHES, " " * len(_DASHES))
    c = fold_accents_expr(c)
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9 ]", "")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


# The same normalization as a DuckDB SQL template, for oracle parity.
# {col} is substituted with the column/expression name.
NORMALIZE_DUCKDB_SQL = (
    "trim(regexp_replace(regexp_replace(lower(strip_accents("
    "regexp_replace({col}, '[-‐‑‒–—―]', ' ', 'g')"
    ")), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
)


def tokenize_expr(col: Column) -> Column:
    """T2: whitespace tokens of the *raw* text (spans refer to these).
    Empty/blank text → empty array."""
    return F.array_remove(F.split(F.trim(col), r"\s+"), "")


def casing_features(ngram: Column) -> list[Column]:
    """T5: capitalization-shape features (Meij'12 Table 2)."""
    return [
        (ngram == F.initcap(ngram)).cast("int").alias("f_is_initcap"),
        (ngram == F.upper(ngram)).cast("int").alias("f_is_upper"),
        (ngram == F.lower(ngram)).cast("int").alias("f_is_lower"),
    ]
