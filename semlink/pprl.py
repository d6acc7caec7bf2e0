"""Privacy-preserving record linkage: Bloom-filter field encoding.

Schnell, Bachteler & Reiher ("Privacy-preserving record linkage using
Bloom filters", BMC Med Inform Decis Mak 2009) is the standard way to
link records across parties that may not exchange raw identifiers:
each quasi-identifier is shredded into character bigrams, every
bigram sets k bit positions of an m-bit Bloom filter via double
hashing (Kirsch-Mitzenmacher: pos_i = (h1 + i*h2) mod m), and pairs
are compared on the Dice coefficient of their filters —
2|A∧B| / (|A|+|B|). Because a single-character edit disturbs at most
two bigrams, Dice stays high under corruptions that break exact or
edit-distance gates (the fixture's ZZZ-prefix names fail the
Levenshtein-2 rule yet keep ~85% of their bigrams).

Spark-first shape — the filter is never materialized as a bitmap:

- ``bloom_positions`` emits the DISTINCT (id, pos) set-bit table via
  explode(sequence) + md5 nibble arithmetic, all JVM expressions
  (the same cross-engine md5-nibble idiom as the feature-hashed
  embedding, simsearch.hashed_embedding_components);
- ``dice_pairs`` computes |A∧B| as ONE (pair, pos) equi join +
  groupBy — fanout per pair is bounded by m — and Dice as exact
  integer arithmetic (scaled-bigint, floor division positive on both
  engines), so the DuckDB oracle re-derives every value bit-exactly.

At 10^12 records the set-bit table is ≤ min(k·(len-1), m) rows per
record (tens), all joins are equi joins keyed by pair or position,
and nothing touches the driver.

The reference mount is empty (SURVEY.md §0); this is the published
PPRL companion to the BASELINE.json pairwise-scoring stage.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M = 256  # filter width; 2 md5 nibbles address exactly 256 bits
BLOOM_K = 4    # hash functions per bigram (double hashing)

_HEX = "0123456789abcdef"


def _nib(p: int) -> Column:
    """md5 hex nibble p (1-based) of column ``hx`` as 0..15 — the
    engine-portable idiom shared verbatim with the oracle SQL."""
    return F.expr(f"instr('{_HEX}', substring(hx, {p}, 1)) - 1")


def bloom_positions(df: DataFrame, id_col: str = "rec_id",
                    text_col: str = "name",
                    m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """DISTINCT (id, pos) set-bit table of the per-record Bloom
    encoding of lower(text): character bigrams → k double-hashed
    positions each. Records shorter than one bigram encode as the
    empty filter (zero rows). Lambda-free: explode(sequence) for the
    bigram index, md5 nibbles for the two base hashes."""
    nm = df.select(F.col(id_col),
                   F.lower(F.col(text_col)).alias("nm")) \
           .filter(F.length("nm") >= 2)
    big = nm.select(
        F.col(id_col), F.col("nm"),
        F.explode(F.sequence(F.lit(1), F.length("nm") - 1)).alias("i"))
    big = big.select(F.col(id_col),
                     F.expr("substring(nm, i, 2)").alias("bg"))
    h = big.withColumn("hx", F.md5("bg"))
    h1 = (_nib(1) * 16 + _nib(2)).alias("h1")
    h2 = (_nib(3) * 16 + _nib(4)).alias("h2")
    hh = h.select(F.col(id_col), h1, h2)
    pos = hh.select(
        F.col(id_col),
        F.explode(F.array(*[
            ((F.col("h1") + F.lit(i) * F.col("h2")) % m).cast("int")
            for i in range(k)])).alias("pos"))
    return pos.distinct()


def dice_pairs(pairs: DataFrame, positions: DataFrame,
               left_col: str = "rec_l", right_col: str = "rec_r",
               id_col: str = "rec_id",
               scale: int = 1_000_000) -> DataFrame:
    """Per candidate pair: Bloom intersection size, both filter
    cardinalities, and the scaled-bigint Dice coefficient
    ``dice6 = floor(2·|A∧B|·scale / (|A|+|B|))`` (exact integer
    arithmetic; operands positive, so Spark's truncating div and the
    oracle's floor div agree). Pairs where either side encodes empty
    get cardinality 0 and dice6 0."""
    card = positions.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("card"))
    pl = positions.select(F.col(id_col).alias(left_col), "pos")
    pr = positions.select(F.col(id_col).alias(right_col), "pos")
    inter = (pairs.join(pl, left_col).join(pr, [right_col, "pos"])
             .groupBy(left_col, right_col)
             .agg(F.count("*").cast("bigint").alias("inter")))
    out = (pairs
           .join(inter, [left_col, right_col], "left")
           .join(card.withColumnRenamed(id_col, left_col)
                     .withColumnRenamed("card", "card_l"),
                 left_col, "left")
           .join(card.withColumnRenamed(id_col, right_col)
                     .withColumnRenamed("card", "card_r"),
                 right_col, "left"))
    filled = out.select(
        F.col(left_col), F.col(right_col),
        F.coalesce("inter", F.lit(0)).cast("bigint").alias("inter"),
        F.coalesce("card_l", F.lit(0)).cast("bigint").alias("card_l"),
        F.coalesce("card_r", F.lit(0)).cast("bigint").alias("card_r"))
    return filled.withColumn(
        "dice6",
        F.when(F.col("card_l") + F.col("card_r") > 0,
               F.expr(f"(2 * CAST({scale} AS BIGINT) * inter) "
                      f"div (card_l + card_r)"))
        .otherwise(F.lit(0)).cast("bigint"))
