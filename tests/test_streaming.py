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
