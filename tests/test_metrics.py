"""X3/X4 string metrics vs the DuckDB oracle on random strings
(SURVEY §5.2 item 1 — oracle-in-test)."""
import duckdb
import hashlib
import numpy as np
import pandas as pd
import pytest

from semlink.metrics_udf import jaro_winkler_batch, levenshtein_batch


def _rand_strings(n, alphabet, maxlen, salt):
    out = []
    for i in range(n):
        h = hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
        while len(h) < maxlen + 2:
            h += hashlib.md5(h.encode()).hexdigest()
        length = int(h[:2], 16) % (maxlen + 1)
        out.append("".join(alphabet[int(h[2 + j], 16) % len(alphabet)]
                           for j in range(length)))
    return out


CASES = [
    ("ab", 8, "small-alpha"),        # many repeats/transpositions
    ("abcdefgh", 16, "mid"),
    ("abcdefghijklmnop qrstuvwxyz", 40, "long"),
]


@pytest.mark.parametrize("alphabet,maxlen,salt", CASES)
def test_levenshtein_vs_duckdb(alphabet, maxlen, salt):
    a = pd.Series(_rand_strings(300, alphabet, maxlen, salt + "a"))
    b = pd.Series(_rand_strings(300, alphabet, maxlen, salt + "b"))
    got = levenshtein_batch(a, b)
    con = duckdb.connect()
    df = pd.DataFrame({"a": a, "b": b})
    exp = con.execute("select levenshtein(a, b) from df").df().iloc[:, 0].to_numpy()
    assert (got == exp).all()


@pytest.mark.parametrize("alphabet,maxlen,salt", CASES)
def test_jaro_winkler_vs_duckdb(alphabet, maxlen, salt):
    a = pd.Series(_rand_strings(300, alphabet, maxlen, salt + "a"))
    b = pd.Series(_rand_strings(300, alphabet, maxlen, salt + "b"))
    got = jaro_winkler_batch(a, b)
    con = duckdb.connect()
    df = pd.DataFrame({"a": a, "b": b})
    exp = con.execute("select jaro_winkler_similarity(a, b) from df").df().iloc[:, 0].to_numpy()
    bad = np.abs(got - exp) > 1e-9
    assert not bad.any(), list(zip(a[bad], b[bad], got[bad], exp[bad]))[:5]


def test_edge_cases():
    a = pd.Series(["", "", "x", "abc", "martha", "dixon", "café"])
    b = pd.Series(["", "y", "", "abc", "marhta", "dicksonx", "cafe"])
    lev = levenshtein_batch(a, b)
    assert list(lev) == [0, 1, 1, 0, 2, 4, 1]
    jw = jaro_winkler_batch(a, b)
    assert jw[0] == 0.0 and jw[1] == 0.0 and jw[2] == 0.0 and jw[3] == 1.0
    assert abs(jw[4] - 0.9611111111) < 1e-6          # classic MARTHA/MARHTA
    assert abs(jw[5] - 0.8133333333) < 1e-6          # classic DIXON/DICKSONX


def test_monge_elkan_exact_mirror(spark):
    """ME(a→b) equals the hand-computed mean-of-best-token-JW, with
    per-token-pair scaling BEFORE aggregation and duplicate token
    OCCURRENCES each counted (posexplode, not distinct)."""
    import pandas as pd
    from semlink.metrics_udf import jaro_winkler_batch
    from semlink.pairs import monge_elkan

    rows = [("martha jones", "marhta jhones"),
            ("x x y", "x"),
            ("alpha beta gamma", "beta gamma delta")]
    df = spark.createDataFrame(rows, "a string, b string")
    got = {(r.a, r.b): r.me6 for r in monge_elkan(df).collect()}

    def jw6(x, y):
        return round(float(jaro_winkler_batch(
            pd.Series([x]), pd.Series([y]))[0]) * 1e6)

    for a, b in rows:
        ta = [t for t in a.split() if t]
        tb = [t for t in b.split() if t]
        best = [max(jw6(x, y) for y in tb) for x in ta]
        want = round(sum(best) / len(best))
        assert got[(a, b)] == want, (a, b)
    assert got[("x x y", "x")] == round((1_000_000 * 2 + jw6("y", "x")) / 3)


def test_soft_tfidf_exact_mirror(spark):
    """soft_tfidf equals a pure-Python IEEE mirror with the same
    quantize-then-aggregate order: idf6/weights/norms as exact ints,
    best-partner selection on (jw6, partner weight, token), terms
    re-quantized before the sum. Covers an exact-token match, a
    close-but-unequal token (apple/appel), a below-theta token, and
    a no-close-token pair scoring 0."""
    import math

    import pandas as pd
    from semlink.metrics_udf import jaro_winkler_batch
    from semlink.pairs import soft_tfidf

    docs = ["red apple", "red appel", "blue berry", "red wine"]
    pairs = [("red apple", "red appel"), ("red apple", "blue berry"),
             ("red apple", "red wine")]
    ddf = spark.createDataFrame([(d,) for d in docs], "doc string")
    pdf = spark.createDataFrame(pairs, "a string, b string")
    got = {(r.a, r.b): r.st6
           for r in soft_tfidf(pdf, ddf, "a", "b").collect()}

    def jw6(x, y):
        return round(float(jaro_winkler_batch(
            pd.Series([x]), pd.Series([y]))[0]) * 1e6)

    n = len(docs)
    df_t = {}
    for d in docs:
        for t in set(d.split()):
            df_t[t] = df_t.get(t, 0) + 1
    idf6 = {t: round(1e6 * math.log(n / df)) for t, df in df_t.items()}

    def weights(d):
        toks = d.split()
        wq = {t: toks.count(t) * idf6[t] for t in set(toks)}
        n2 = sum(v * v for v in wq.values())
        return wq, {t: v / math.sqrt(n2) for t, v in wq.items()}

    for a, b in pairs:
        wqa, wna = weights(a)
        wqb, wnb = weights(b)
        st = 0
        for t in wna:
            cands = sorted(((jw6(t, v), wqb[v], v) for v in wnb),
                           key=lambda c: (-c[0], -c[1], c[2]))
            bj, _, bv = cands[0]
            if bj > 900_000:
                st += round((wna[t] * wnb[bv] * (bj / 1_000_000.0))
                            * 1_000_000)
        assert got[(a, b)] == st, (a, b, got[(a, b)], st)
    assert got[("red apple", "blue berry")] == 0
    assert got[("red apple", "red appel")] > got[("red apple", "red wine")]


def test_soft_tfidf_fixture_bounds(spark):
    """Fixture entry at sf0.001: every first-token-blocked pair has
    at least the shared first token close (st6 > 0), scores respect
    the cosine ceiling up to per-term rounding, and a pair of
    identical token multisets would score ~1 — approximated by the
    max being well above the median."""
    from semlink.queries.rl import rl_soft_tfidf
    rows = rl_soft_tfidf(spark, "/root/testdata/sf0.001").collect()
    assert rows
    vals = sorted(r.st6 for r in rows)
    assert vals[0] > 0
    assert vals[-1] <= 1_000_000 + 10  # <= #close-terms rounding slack


def test_jw_batch_all_short_side_no_crash():
    """Regression: a batch whose b-side strings are ALL shorter than
    the 4-char Winkler prefix window used to broadcast-fail against
    the untrimmed a-side matrix. Values must equal the swapped call
    (JW is symmetric) and the known MARTHA prefix-boost shape."""
    import pandas as pd
    from semlink.metrics_udf import jaro_winkler_batch
    a = pd.Series(["apple", "wine", "martha"])
    b = pd.Series(["red", "ab", "mar"])
    fwd = jaro_winkler_batch(a, b)
    rev = jaro_winkler_batch(b, a)
    assert list(fwd) == list(rev)
    # 'mar' is a clean 3-char prefix of 'martha': jaro = (3/6+3/3+3/3)/3
    j = (0.5 + 1 + 1) / 3
    assert abs(fwd[2] - (j + 0.3 * (1 - j))) < 1e-12


def test_soft_tfidf_zero_idf_doc_scores_zero(spark):
    """A document whose every token is corpus-universal has zero
    TF-IDF norm: its weights are defined as 0 (no NaN through the
    0/0 divide), so pairs involving it score exactly 0 while normal
    pairs are unaffected."""
    from semlink.pairs import soft_tfidf
    docs = ["acme", "acme west", "acme westt"]
    ddf = spark.createDataFrame([(d,) for d in docs], "doc string")
    pdf = spark.createDataFrame(
        [("acme", "acme west"), ("acme west", "acme westt")],
        "a string, b string")
    got = {(r.a, r.b): r.st6
           for r in soft_tfidf(pdf, ddf, "a", "b").collect()}
    assert got[("acme", "acme west")] == 0       # zero-norm doc
    # west/westt clear theta (JW ~0.96), both carry idf -> positive
    assert got[("acme west", "acme westt")] > 0


def _ag_mirror(a, b):
    """Independent quadratic Gotoh DP (plain Python, full 3-matrix
    recurrence — no closed-form row scan) for pinning the vectorized
    kernel."""
    from semlink.metrics_udf import AG_EXTEND, AG_MATCH, AG_MISMATCH, AG_OPEN
    NEG = -(1 << 30)
    la, lb = len(a), len(b)
    M = [[NEG] * (lb + 1) for _ in range(la + 1)]
    Ix = [[NEG] * (lb + 1) for _ in range(la + 1)]
    Iy = [[NEG] * (lb + 1) for _ in range(la + 1)]
    M[0][0] = 0
    for j in range(1, lb + 1):
        Iy[0][j] = -(AG_OPEN + AG_EXTEND * (j - 1))
    for i in range(1, la + 1):
        Ix[i][0] = -(AG_OPEN + AG_EXTEND * (i - 1))
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            s = AG_MATCH if a[i - 1] == b[j - 1] else -AG_MISMATCH
            M[i][j] = max(M[i - 1][j - 1], Ix[i - 1][j - 1],
                          Iy[i - 1][j - 1]) + s
            Ix[i][j] = max(M[i - 1][j] - AG_OPEN, Ix[i - 1][j] - AG_EXTEND)
            Iy[i][j] = max(M[i][j - 1] - AG_OPEN, Iy[i][j - 1] - AG_EXTEND)
    return max(M[la][lb], Ix[la][lb], Iy[la][lb])


def test_affine_gap_matches_quadratic_mirror():
    """The batch-vectorized Gotoh kernel (closed-form in-row gap scan)
    equals the plain quadratic DP on hand cases, empties, and 400
    pseudo-random pairs; sim6 invariants: equal strings are exactly
    1e6, two empties 1e6, similarity never negative."""
    import random

    import pandas as pd

    from semlink.metrics_udf import affine_gap_batch, affine_gap_sim6

    pairs = [("", ""), ("abc", ""), ("", "xy"), ("smith", "smith"),
             ("smith", "smith, john"), ("abcdefgh", "abXdefgh"),
             ("aaaa", "bbbb"), ("ab", "ba")]
    rng = random.Random(99)
    for _ in range(400):
        n1, n2 = rng.randint(0, 15), rng.randint(0, 15)
        pairs.append(("".join(rng.choice("abcd") for _ in range(n1)),
                      "".join(rng.choice("abcd") for _ in range(n2))))
    A = pd.Series([p[0] for p in pairs])
    B = pd.Series([p[1] for p in pairs])
    got = affine_gap_batch(A, B)
    for k, (a, b) in enumerate(pairs):
        assert got[k] == _ag_mirror(a, b), (a, b, got[k])
    s6 = affine_gap_sim6(A, B)
    assert s6[0] == 1_000_000 and s6[3] == 1_000_000
    assert (s6 >= 0).all()


def test_affine_gap_golden_and_block_beats_scatter():
    """The pinned rl_affine_gap golden table equals a fresh kernel run
    over the fixtures (stale golden_affine.json fails here first), and
    the structural invariant holds: one 6-char block insertion
    outscores six scattered single-char insertions in EVERY group."""
    import json
    import os

    import pandas as pd

    from semlink.metrics_udf import (affine_gap_batch, affine_gap_sim6,
                                     synthesize_alignment_pairs)

    fx = synthesize_alignment_pairs(50)
    A = pd.Series([r[2] for r in fx])
    B = pd.Series([r[3] for r in fx])
    sc = affine_gap_batch(A, B)
    s6 = affine_gap_sim6(A, B)
    fresh = {r[0]: [r[1], int(sc[i]), int(s6[i])] for i, r in enumerate(fx)}
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "semlink", "golden_affine.json")
    golden = {r[0]: r[1:] for r in json.load(open(p))}
    assert fresh == golden and len(golden) == 200
    for g in range(50):
        assert fresh[f"ag{g}_block"][2] > fresh[f"ag{g}_scatter"][2]
        assert fresh[f"ag{g}_equal"][2] == 1_000_000
