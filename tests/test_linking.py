"""J1/F3/X6/O4: end-to-end linking on the tiny fixture — every
ground-truth mention must be found, survive largest-matching, and
resolve to its true entity (context disambiguation included)."""
import pytest
from pyspark.sql import functions as F

from semlink.config import SemlinkConfig
from semlink.linking import (candidate_join, generate_mentions,
                             largest_matching_filter, link_transcripts,
                             relatedness_table, salted_candidate_join)


@pytest.fixture(scope="module")
def resolved(spark, fx_tiny_dfs):
    d = fx_tiny_dfs
    out = link_transcripts(d["transcripts"], d["anchors"], d["page_links"])
    out.cache()
    return out


def test_all_gt_mentions_found_and_maximal(resolved, fx_tiny_dfs):
    got = {r.mention_id for r in resolved.select("mention_id").collect()}
    want = {r.mention_id for r in fx_tiny_dfs["mentions_gt"].collect()}
    assert got == want


def test_resolution_accuracy_is_exact(resolved, fx_tiny_dfs):
    joined = resolved.alias("r").join(
        fx_tiny_dfs["mentions_gt"].alias("g"), "mention_id")
    n = joined.count()
    ok = joined.filter(F.col("r.target_id") == F.col("g.true_entity")).count()
    assert n == ok and n > 0


def test_blocking_key_matches_generator(resolved, fx_tiny_dfs):
    # the Spark-side normalized ngram must equal the generator's
    # anchor_norm for every ground-truth mention (byte-identical
    # blocking keys, SURVEY §7.3.3)
    j = resolved.alias("r").join(fx_tiny_dfs["mentions_gt"].alias("g"), "mention_id")
    bad = j.filter(F.col("r.ngram_norm") != F.col("g.anchor_norm")).count()
    assert bad == 0


def test_largest_matching_drops_contained(spark, fx_tiny_dfs):
    # without F3, alias subgrams inside 2-word titles produce extra
    # candidates; F3 must remove exactly those
    t = fx_tiny_dfs["transcripts"]
    m = generate_mentions(t)
    c = candidate_join(m, fx_tiny_dfs["anchors"])
    before = c.select("mention_id").distinct().count()
    after = largest_matching_filter(c).select("mention_id").distinct().count()
    gt = fx_tiny_dfs["mentions_gt"].count()
    assert after == gt
    assert before > after  # fixture really exercises F3


def test_salted_join_equals_plain_join(spark, fx_tiny_dfs):
    d = fx_tiny_dfs
    m = generate_mentions(d["transcripts"])
    plain = candidate_join(m, d["anchors"])
    hot = spark.createDataFrame(
        [("legion",), ("mercury",)], "anchor_norm string")
    # also include the fixture's genuinely-hot key
    from semlink.fixtures import generate
    salted = salted_candidate_join(m, d["anchors"], hot,
                                   SemlinkConfig(salt_buckets=4))
    cols = ["mention_id", "target_id"]
    assert plain.select(cols).exceptAll(salted.select(cols)).count() == 0
    assert salted.select(cols).exceptAll(plain.select(cols)).count() == 0


def test_relatedness_symmetric(spark, fx_tiny_dfs):
    rel = relatedness_table(fx_tiny_dfs["page_links"], fx_tiny_dfs["anchors"])
    r = rel.select(
        F.least("e1", "e2").alias("a"), F.greatest("e1", "e2").alias("b"),
        "shared_inlinks")
    asym = (r.groupBy("a", "b")
            .agg(F.count_distinct("shared_inlinks").alias("n"),
                 F.count("*").alias("c"))
            .filter((F.col("n") != 1) | (F.col("c") != 2)).count())
    assert asym == 0


def test_relatedness_hot_source_capped(spark):
    """A degree-K+ hub source must be excluded BEFORE the self-join
    (bounded intermediate rows, VERDICT r01 wrong #3), and mw_rel must
    be the log-normalized Milne-Witten value in [0, 1]."""
    import math

    from semlink.config import SemlinkConfig

    ents = spark.createDataFrame([(i,) for i in range(80)], "target_id long")
    hub = [(999, i) for i in range(80)]                 # degree-80 hub
    normal = ([(10_000 + i, i) for i in range(80)]
              + [(10_000 + i, (i + 1) % 80) for i in range(80)])
    pl = spark.createDataFrame(hub + normal, "src_id long, dst_id long")
    rel = relatedness_table(pl, ents, SemlinkConfig(max_source_out_degree=64))
    rows = rel.collect()
    # hub excluded: only the ring-neighbor pairs remain (80 ordered pairs
    # each direction), never the hub's 80*79
    assert len(rows) == 160
    n_pages = 81  # 80 normal srcs + the hub (N counts all linking pages)
    for r in rows:
        assert 0.0 <= r.mw_rel <= 1.0
        # n1 = n2 = 2 inlinks per entity, inter = 1:
        want = 1 - (math.log(2) - math.log(1)) / (math.log(n_pages) - math.log(2))
        assert abs(r.mw_rel - want) < 1e-9


def test_resolve_senses_scale_mode_identical(spark, fx_tiny_dfs):
    """broadcast_context_tables=False (the shuffle-join scale regime
    with rel semi-joined to candidate entities) must resolve exactly
    the same senses as the broadcast default."""
    from semlink.config import SemlinkConfig
    from semlink.linking import link_transcripts

    d = fx_tiny_dfs
    cols = ["mention_id", "target_id"]
    a = {tuple(r) for r in link_transcripts(
        d["transcripts"], d["anchors"], d["page_links"],
        SemlinkConfig()).select(cols).collect()}
    b = {tuple(r) for r in link_transcripts(
        d["transcripts"], d["anchors"], d["page_links"],
        SemlinkConfig(broadcast_context_tables=False)).select(cols).collect()}
    assert a == b and len(a) > 0


def test_qgram_blocking_typo_recall_and_template_immunity(spark):
    """The fractional q-gram rule co-blocks single-typo variants
    (one edit disturbs at most 2 of n+1 padded bigrams) but does NOT
    admit pairs whose only overlap is a long templated prefix — the
    degeneracy that sank an absolute count threshold."""
    import tempfile

    from semlink.queries import REGISTRY

    rows = [(0, "goldenrod lavender spring"),
            (1, "goldenrod lavander spring"),       # one typo
            (2, "midnight chocolate lace"),
            (3, "ACME#1 alpha beta gamma"),         # shared template,
            (4, "ACME#2 delta epsilon zeta")]       # long distinct tails
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    d = tempfile.mkdtemp(prefix="semlink_qg_")
    df.write.mode("overwrite").parquet(f"{d}/part.parquet")
    got = {frozenset((r.left_name, r.right_name)): r.shared_qgrams
           for r in REGISTRY["rl_qgram_blocking"][0](spark, d).collect()}
    names = {i: t for i, t in rows}
    assert frozenset((names[0], names[1])) in got   # typo pair co-blocks
    assert frozenset((names[3], names[4])) not in got
    assert all(names[2] not in pair for pair in got)


def test_gap_sessions_planted(spark):
    """Gap-rule sessionization: events 29 minutes apart chain into one
    session, a 31-minute gap opens a new one, users are independent,
    and a simultaneous-timestamp tie breaks on event_id without
    splitting."""
    import datetime
    import tempfile

    from semlink.queries import REGISTRY

    t0 = datetime.datetime(2024, 1, 1)
    m = datetime.timedelta(minutes=1)
    rows = [
        (0, t0, 1), (1, t0 + 29 * m, 1), (2, t0 + 58 * m, 1),  # one sess
        (3, t0 + 90 * m, 1),                                    # +32min: new
        (4, t0, 2), (5, t0, 2),                                 # tie, user 2
    ]
    df = spark.createDataFrame(
        [(e, t, u, "x", 0.0, "{}") for e, t, u in rows],
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string")
    d = tempfile.mkdtemp(prefix="semlink_sess_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {(r.user_id, r.session_idx): (r.n_events, r.duration_us)
           for r in REGISTRY["rl_gap_sessions"][0](spark, d).collect()}
    assert got[(1, 1)] == (3, 58 * 60 * 1_000_000)
    assert got[(1, 2)] == (1, 0)
    assert got[(2, 1)] == (2, 0)
    assert len(got) == 3
