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


def test_first_word_gate_dataframe_equals_inset(spark):
    """F4 large-dictionary gate: the broadcast-semi-join form must
    produce exactly the InSet-literal form's mentions, and the plan
    must gate via a broadcast join (the gate never silently vanishes
    for big dictionaries — VERDICT r01 missing #4)."""
    import io as _io
    from contextlib import redirect_stdout

    from semlink.ngrams import explode_mentions

    rows = [(f"c{i}", 0, f"alpha{i % 7} beta{i % 5} gamma delta{i % 3}")
            for i in range(200)]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    fw_list = [f"alpha{k}" for k in range(7)] + ["gamma"]
    fw_df = spark.createDataFrame([(w,) for w in fw_list], "w string")

    a = explode_mentions(t, first_words=fw_list)
    b = explode_mentions(t, first_words=fw_df)
    cols = ["mention_id", "ngram", "ngram_norm"]
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    assert b.select(cols).exceptAll(a.select(cols)).count() == 0
    assert a.count() > 0

    buf = _io.StringIO()
    with redirect_stdout(buf):
        b.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_anchor_first_words_switches_to_dataframe(spark):
    from pyspark.sql import DataFrame as _DF

    from semlink.linking import anchor_first_words

    anchors = spark.createDataFrame(
        [(f"anchor{i} tail", i) for i in range(50)],
        "anchor_norm string, target_id long")
    small = anchor_first_words(anchors, max_set_size=100)
    assert isinstance(small, list) and "anchor7" in small
    big = anchor_first_words(anchors, max_set_size=10)
    assert isinstance(big, _DF)
    assert {r.w for r in big.collect()} == {f"anchor{i}" for i in range(50)}

def test_hof_gate_forms_agree_on_empty_norm_leading_tokens(spark):
    """ADVICE r02: the HOF DataFrame gate must test the span's OWN
    leading normalized token (like the InSet form), so spans whose
    leading token normalizes to '' — punctuation-only tokens — are
    gated identically by both physical forms."""
    from semlink.ngrams import explode_mentions_hof

    rows = [("c1", 0, "-- alpha beta"),       # '--' normalizes to ''
            ("c2", 0, "alpha !! gamma"),
            ("c3", 0, "?? ,, alpha")]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    fw = ["alpha", "gamma"]
    fw_df = spark.createDataFrame([(w,) for w in fw], "w string")

    a = explode_mentions_hof(t, first_words=fw)
    b = explode_mentions_hof(t, first_words=fw_df)
    cols = ["mention_id", "ngram", "ngram_norm"]
    sa = {tuple(r) for r in a.select(cols).collect()}
    sb = {tuple(r) for r in b.select(cols).collect()}
    assert sa == sb and len(sa) > 0
    # a span led by a punctuation-only token is gated OUT by both forms
    assert not any(r[1].startswith("--") for r in sa)
