"""Offline anchor-dictionary build (SURVEY A1-A9, M2).

The reference consumes Wikipedia-Miner CSV statistics (its loader
parses precomputed label/page counts); the new engine REBUILDS them
from a raw link corpus `raw_links(doc_id, anchor, target_id, is_link)`
with classic hash aggregations, normalizing surface forms FIRST so the
dictionary side and the query side share byte-identical blocking keys.

All map-side-combinable aggregations; one shuffle per groupBy key set.
At 10^12-link scale: `approx_count_distinct` replaces exact distinct
doc counts (documented, off by default), and the anchor key space is
hash-partitioned — no skew issue because aggregation combines partials
before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textnorm import normalize_expr


def build_anchor_dictionary(raw_links: DataFrame, pages: DataFrame,
                            approx: bool = False) -> DataFrame:
    """raw_links + pages → anchors(anchor_norm, target_id, target_title,
    sense_link_count, anchor_link_total, anchor_text_total,
    from_title, from_redirect).

    A1 anchor totals, A2 sense counts, A3 text totals, A7 redirect
    resolution, A8 title-as-anchor flags, A9 handled in pages build.
    """
    normed = raw_links.withColumn("anchor_norm", normalize_expr(F.col("anchor")))

    # A7: resolve redirects before counting (links to a redirect page
    # count toward its canonical target)
    p = pages.select("target_id", "title", "is_redirect")
    redirects = (p.filter(F.col("is_redirect"))
                 .select(F.col("target_id").alias("rd_id"),
                         F.col("title").alias("rd_title")))
    canon = p.filter(~F.col("is_redirect")).select(
        F.col("target_id").alias("canon_id"),
        normalize_expr(F.col("title")).alias("canon_norm"))
    rd_join = redirects.join(
        canon, normalize_expr(F.col("rd_title")) == F.col("canon_norm"),
        "inner")
    rd_map = rd_join.select(F.col("rd_id"), F.col("canon_id"))
    # A8: (anchor_norm, target) pairs that exist as a redirect title —
    # the sense provenance flag the reference carries per anchor row
    rd_flags = rd_join.select(
        normalize_expr(F.col("rd_title")).alias("anchor_norm"),
        F.col("canon_id").alias("target_id"),
        F.lit(True).alias("_from_rd")).distinct()
    normed = (normed
              .join(F.broadcast(rd_map),
                    normed.target_id == rd_map.rd_id, "left")
              .withColumn("target_id",
                          F.coalesce(F.col("canon_id"), F.col("target_id")))
              .drop("rd_id", "canon_id"))

    links = normed.filter(F.col("is_link"))

    # A2: per-(anchor, target) sense counts
    sense = links.groupBy("anchor_norm", "target_id").agg(
        F.count("*").alias("sense_link_count"))

    # A1: per-anchor link totals
    cd = (F.approx_count_distinct if approx else F.count_distinct)
    anchor_tot = links.groupBy("anchor_norm").agg(
        F.count("*").alias("anchor_link_total"),
        cd("doc_id").alias("anchor_link_docs"))

    # A3: per-anchor text-occurrence totals (link or not)
    text_tot = normed.groupBy("anchor_norm").agg(
        F.count("*").alias("anchor_text_total"),
        cd("doc_id").alias("anchor_text_docs"))

    titles = pages.select(
        F.col("target_id"), F.col("title").alias("target_title"),
        normalize_expr(F.col("title")).alias("_title_norm"))

    out = (sense
           .join(anchor_tot, "anchor_norm")
           .join(text_tot, "anchor_norm")
           .join(F.broadcast(titles), "target_id", "left")
           # A8: sense provenance flags
           .withColumn("from_title", F.col("anchor_norm") == F.col("_title_norm"))
           .join(F.broadcast(rd_flags), ["anchor_norm", "target_id"], "left")
           .withColumn("from_redirect",
                       F.coalesce(F.col("_from_rd"), F.lit(False)))
           .drop("_title_norm", "_from_rd"))
    return out.select(
        "anchor_norm", "target_id", "target_title", "sense_link_count",
        "anchor_link_total", "anchor_text_total", "from_title", "from_redirect",
        "anchor_link_docs", "anchor_text_docs")


def build_page_stats(page_links: DataFrame, pages: DataFrame) -> DataFrame:
    """A9: in/out-degree per page from the link graph."""
    inc = page_links.groupBy(F.col("dst_id").alias("target_id")).agg(
        F.count("*").alias("inlink_count"))
    outc = page_links.groupBy(F.col("src_id").alias("target_id")).agg(
        F.count("*").alias("outlink_count"))
    return (pages.select("target_id", "title", "is_redirect")
            .join(inc, "target_id", "left")
            .join(outc, "target_id", "left")
            .fillna(0, ["inlink_count", "outlink_count"]))
