"""J2 in the shuffle-join regime: the full link stage with
broadcast_dictionary=False + aggressive hot-key salting must produce
byte-identical resolution to the broadcast path."""
from pyspark.sql import functions as F

from semlink.config import SemlinkConfig
from semlink.linking import link_transcripts


def test_salted_link_equals_broadcast_link(spark, fx_tiny_dfs):
    d = fx_tiny_dfs
    base = link_transcripts(d["transcripts"], d["anchors"], d["page_links"],
                            SemlinkConfig())
    salted = link_transcripts(
        d["transcripts"], d["anchors"], d["page_links"],
        SemlinkConfig(broadcast_dictionary=False,
                      hot_key_min_count=5,    # forces real salting
                      salt_buckets=4))
    cols = ["mention_id", "target_id"]
    a, b = base.select(cols), salted.select(cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() == b.count() > 0
