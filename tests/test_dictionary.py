"""M2: rebuilt dictionary must match the fixture's golden anchors table
on every count column (A1-A3) and derived probability (A4-A6)."""
from pyspark.sql import functions as F

from semlink.dictionary import build_anchor_dictionary, build_page_stats
from semlink.linking import with_probabilities


def test_dictionary_counts_match_golden(spark, fx_tiny_dfs):
    d = fx_tiny_dfs
    built = build_anchor_dictionary(d["raw_links"], d["pages"])
    cols = ["anchor_norm", "target_id", "sense_link_count",
            "anchor_link_total", "anchor_text_total"]
    g = d["anchors"].select(cols)
    b = built.select(cols)
    assert g.exceptAll(b).count() == 0
    assert b.exceptAll(g).count() == 0


def test_probability_math(spark, fx_tiny_dfs):
    built = with_probabilities(
        build_anchor_dictionary(fx_tiny_dfs["raw_links"], fx_tiny_dfs["pages"]))
    bad = built.filter(
        (F.abs(F.col("prior_prob")
               - F.col("sense_link_count") / F.col("anchor_link_total")) > 1e-12)
        | (F.col("sense_prob") > F.col("link_prob") + 1e-12)
        | (F.col("prior_prob") > 1.0 + 1e-12)
        | (F.col("link_prob") > 1.0 + 1e-12)).count()
    assert bad == 0
    # priors per anchor sum to 1
    s = (built.groupBy("anchor_norm").agg(F.sum("prior_prob").alias("s"))
         .filter(F.abs(F.col("s") - 1.0) > 1e-9).count())
    assert s == 0


def test_from_title_flag(spark, fx_tiny_dfs):
    built = build_anchor_dictionary(fx_tiny_dfs["raw_links"], fx_tiny_dfs["pages"])
    j = built.alias("b").join(
        fx_tiny_dfs["anchors"].alias("g"),
        ["anchor_norm", "target_id"])
    bad = j.filter(F.col("b.from_title") != F.col("g.from_title")).count()
    assert bad == 0


def test_page_degree_stats(spark, fx_tiny_dfs):
    built = build_page_stats(fx_tiny_dfs["page_links"], fx_tiny_dfs["pages"])
    j = built.alias("b").join(fx_tiny_dfs["pages"].alias("g"), "target_id")
    bad = j.filter(
        (F.col("b.inlink_count") != F.col("g.inlink_count"))
        | (F.col("b.outlink_count") != F.col("g.outlink_count"))).count()
    assert bad == 0


def test_from_redirect_flag_set(spark):
    """A8: an anchor that is a redirect page's title gets
    from_redirect=True on the canonical sense."""
    from semlink.dictionary import build_anchor_dictionary
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(
        [(1, "Main Page", False), (2, "Alias Name", True),
         (3, "Main Page", True)],   # 3 redirects to 1 by title
        "target_id long, title string, is_redirect boolean")
    # "alias name" must resolve where? redirect 2 has no canon with that
    # title → unresolved; links to 2 stay on 2
    raw = spark.createDataFrame(
        [(10, "Main Page", 3, True),     # via redirect 3 → canon 1
         (11, "main-page", 1, True),     # direct
         (12, "Alias Name", 2, True)],   # unresolvable redirect target
        "doc_id long, anchor string, target_id long, is_link boolean")
    d = build_anchor_dictionary(raw, pages)
    rows = {(r.anchor_norm, r.target_id): r for r in d.collect()}
    assert rows[("main page", 1)].from_redirect is True   # redirect 3 title
    assert rows[("main page", 1)].from_title is True
    assert rows[("main page", 1)].sense_link_count == 2   # both links merged
    assert rows[("alias name", 2)].from_redirect is False
