"""T3 n-gram explode: span correctness + DuckDB-oracle parity."""
import duckdb

from semlink.ngrams import explode_mentions, ngram_duckdb_sql


def test_ngram_spans(spark):
    df = spark.createDataFrame(
        [("c1", 0, "alpha beta gamma"), ("c1", 1, ""), ("c2", 0, "solo")],
        "conv_id string, turn_idx int, text string")
    got = {
        (r.conv_id, r.turn_idx, r.span_start, r.span_len): r.ngram
        for r in explode_mentions(df, max_n=2).collect()
    }
    assert got == {
        ("c1", 0, 0, 1): "alpha", ("c1", 0, 1, 1): "beta", ("c1", 0, 2, 1): "gamma",
        ("c1", 0, 0, 2): "alpha beta", ("c1", 0, 1, 2): "beta gamma",
        ("c2", 0, 0, 1): "solo",
    }


def test_ngram_mention_ids(spark):
    df = spark.createDataFrame([("c1", 3, "x y")], "conv_id string, turn_idx int, text string")
    ids = {r.mention_id for r in explode_mentions(df, max_n=2).collect()}
    assert ids == {"c1:3:0:1", "c1:3:1:1", "c1:3:0:2"}


def test_ngram_duckdb_parity(spark):
    rows = [("d%d" % i, 0, t) for i, t in enumerate(
        ["one two three four", "a", "", "pad pad pad pad pad pad"])]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = sorted(
        (r.conv_id, r.span_start, r.span_len, r.ngram)
        for r in explode_mentions(df, max_n=3).collect())
    con = duckdb.connect()
    con.execute("create table docs as select * from (values %s) t(conv_id, turn_idx, text)"
                % ",".join("('%s', %d, '%s')" % r for r in rows))
    oracle = sorted(tuple(r) for r in con.execute(
        ngram_duckdb_sql("docs", "conv_id", "text", 3)).fetchall())
    assert got == oracle
