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
