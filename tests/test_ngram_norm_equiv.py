"""Property test: tokenwise-normalized blocking keys are byte-identical
to whole-string normalization of the n-gram (the optimization in
ngrams.ngram_struct_expr must never drift from textnorm.normalize_expr)."""
import hashlib

from pyspark.sql import functions as F

from semlink.ngrams import explode_mentions
from semlink.textnorm import normalize_expr


def _rand_texts(n):
    pieces = ["Café-Noir", "UPPER", "mixedCase", "a-b", "!!!", "x",
              "ñandú", "dash—em", "a1", "", "trailing-", "-lead", "§¶",
              "Ürümqi", "plain", "two  spaces"]
    out = []
    for i in range(n):
        h = hashlib.md5(f"t:{i}".encode()).hexdigest()
        k = 1 + int(h[:2], 16) % 7
        out.append(" ".join(pieces[int(h[2 + j], 16) % len(pieces)]
                            for j in range(k)))
    return out


def test_tokenwise_norm_equivalence(spark):
    df = spark.createDataFrame(
        [(f"c{i}", 0, t) for i, t in enumerate(_rand_texts(300))],
        "conv_id string, turn_idx int, text string")
    m = explode_mentions(df, max_n=3)
    bad = m.filter(
        F.col("ngram_norm") != normalize_expr(F.col("ngram"))).count()
    assert bad == 0
