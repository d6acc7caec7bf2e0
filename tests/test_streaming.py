"""§2.10 streaming ingestion: file-source micro-batch end-to-end —
streamed candidate links must equal the batch join on the same data."""
import time

from semlink.fixtures import generate, to_spark
from semlink.linking import candidate_join, generate_mentions
from semlink.streaming import stream_candidates


def test_stream_matches_batch(spark, fx_tiny_dfs, tmp_path):
    d = fx_tiny_dfs
    src = str(tmp_path / "stream_src")
    d["transcripts"].coalesce(2).write.parquet(src)

    batch = candidate_join(
        generate_mentions(d["transcripts"]), d["anchors"])
    expected = sorted(
        (r.mention_id, r.target_id)
        for r in batch.select("mention_id", "target_id").collect())

    stream = spark.readStream.schema(
        d["transcripts"].schema).parquet(src)
    out = stream_candidates(stream, d["anchors"])
    q = (out.select("mention_id", "target_id").writeStream
         .format("memory").queryName("cands_t")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(
        (r.mention_id, r.target_id)
        for r in spark.sql("select * from cands_t").collect())
    assert got == expected


def test_windowed_mention_counts_match_batch(spark, fx_tiny_dfs, tmp_path):
    """Session-windowed per-conversation candidate counts: streaming
    (availableNow micro-batches) must equal the same session_window
    aggregation computed in batch."""
    from pyspark.sql import functions as F

    from semlink.streaming import windowed_mention_counts

    d = fx_tiny_dfs
    src = str(tmp_path / "wstream_src")
    d["transcripts"].coalesce(2).write.parquet(src)

    stream = spark.readStream.schema(d["transcripts"].schema).parquet(src)
    out = windowed_mention_counts(stream, d["anchors"], gap="30 minutes")
    q = (out.writeStream.format("memory").queryName("wcounts_t")
         .option("checkpointLocation", str(tmp_path / "wckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.conv_id, r.w.start, r.w.end, r.n_candidates, r.n_entities)
           for r in spark.sql("select * from wcounts_t").collect()}

    t = d["transcripts"]
    mentions = generate_mentions(t.select("conv_id", "turn_idx", "text"),
                                 streaming=True)
    keyed = mentions.join(t.select("conv_id", "turn_idx", "ts"),
                          ["conv_id", "turn_idx"])
    cands = candidate_join(keyed, d["anchors"])
    batch_rows = cands.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "conv_id").agg(
        F.count("*").alias("n_candidates"),
        F.approx_count_distinct("target_id").alias("n_entities")).collect()
    expected = {(r.conv_id, r.w.start, r.w.end, r.n_candidates, r.n_entities)
                for r in batch_rows}

    # append-mode semantics: a session window is emitted only once the
    # watermark (max event time − 10 min default) passes its END; the
    # tail window(s) stay in state awaiting more data. Pin exactly that.
    import datetime
    max_ts = t.agg(F.max("ts")).first()[0]
    horizon = max_ts - datetime.timedelta(minutes=10)
    emitted = {e for e in expected if e[2] <= horizon}
    held_back = expected - emitted
    assert got == emitted and len(got) > 0
    assert all(e[2] > horizon for e in held_back)
