"""Bloom-filter PPRL (semlink.pprl): set-bit positions pinned against
a pure-Python mirror, exact Dice arithmetic, and the recall property
the encoding exists for — prefix corruption that fails the
edit-distance gate keeps Dice high."""
import hashlib

from pyspark.sql import functions as F

from semlink.pprl import BLOOM_K, BLOOM_M, bloom_positions, dice_pairs


def _pymirror(name, m=BLOOM_M, k=BLOOM_K):
    nm = name.lower()
    s = set()
    for i in range(len(nm) - 1):
        hx = hashlib.md5(nm[i:i + 2].encode()).hexdigest()
        h1 = int(hx[0], 16) * 16 + int(hx[1], 16)
        h2 = int(hx[2], 16) * 16 + int(hx[3], 16)
        for j in range(k):
            s.add((h1 + j * h2) % m)
    return s


def test_bloom_positions_match_python_mirror(spark):
    """Spark md5-nibble double hashing == hashlib double hashing for
    mixed-case and symbol-bearing names; sub-bigram records encode as
    the empty filter (zero rows)."""
    df = spark.createDataFrame(
        [(1, "Customer#000000010"), (2, "ZZZCustomer#000000010"),
         (3, "x"), (4, "AB")],
        "rec_id long, name string")
    got = {}
    for r in bloom_positions(df).collect():
        got.setdefault(r.rec_id, set()).add(r.pos)
    assert got[1] == _pymirror("Customer#000000010")
    assert got[2] == _pymirror("ZZZCustomer#000000010")
    assert got[4] == _pymirror("AB")
    assert 3 not in got


def test_dice_exact_arithmetic(spark):
    """dice6 is the exact floor((2e6*inter)/(card_l+card_r)):
    identical names score 1_000_000, an empty side scores 0 with
    cardinality 0, and a corrupted true pair reproduces the
    hand-computed rational."""
    df = spark.createDataFrame(
        [(1, "Customer#000000010"), (2, "Customer#000000010"),
         (3, "ZZZCustomer#000000010"), (4, "x")],
        "rec_id long, name string")
    pos = bloom_positions(df)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "rec_l long, rec_r long")
    rows = {(r.rec_l, r.rec_r): r for r in dice_pairs(pairs, pos).collect()}
    a = _pymirror("Customer#000000010")
    b = _pymirror("ZZZCustomer#000000010")
    assert rows[(1, 2)].dice6 == 1_000_000
    assert rows[(1, 3)].inter == len(a & b)
    assert rows[(1, 3)].dice6 == (2 * 1_000_000 * len(a & b)) \
        // (len(a) + len(b))
    assert rows[(1, 4)].dice6 == 0 and rows[(1, 4)].card_r == 0


def test_pprl_recovers_edit_gate_escapees(spark):
    """On the corruption fixture, every ZZZ-prefixed true pair (name
    Levenshtein 3 > the gate's 2) still scores dice6 >= 0.8 — the
    encoding's recall argument. TPC-H customer names share a 15-char
    prefix, so bigram Dice floors high for FALSE pairs too; the
    true/false mean separation is narrow but deterministic —
    asserted as such (PPRL is a recall tool; precision comes from
    the downstream score combination)."""
    from semlink.queries.linkeval import rl_pprl_bloom
    df = rl_pprl_bloom(spark, "/root/testdata/sf0.001").cache()
    # ZZZ names are duplicates with ck%5==0; duplicates exist at
    # ck%3==0 and rec_l = 2ck+1, so ZZZ true pairs <=> (rec_l-1)%30==0
    zzz = df.filter(F.col("is_match") & ((F.col("rec_l") - 1) % 30 == 0))
    got = zzz.agg(F.min("dice6"), F.count("*")).collect()[0]
    assert got[1] > 0 and got[0] >= 800_000
    means = {r.is_match: r.m for r in
             df.groupBy("is_match").agg(F.avg("dice6").alias("m"))
             .collect()}
    assert means[True] > means[False] + 30_000
    df.unpersist()
