"""Structured Streaming ingestion (SURVEY §2.10, optional extension).

The reference is a long-lived HTTP service linking one document at a
time with a rolling `context`; the Spark-idiomatic recast is a
continuous pipeline over the transcripts table:

  readStream(transcripts) → clean/explode/normalize (stateless T1-T4)
  → broadcast dictionary join (J1) → watermarked session window per
  conv_id for context accumulation → foreachBatch append of candidate
  edges. Clustering stays a periodic batch job: iterative CC is not
  expressible as an incremental streaming operator, and the north rule
  defines it as a checkpointed batch loop anyway.

Late turns beyond the watermark are dropped by Spark and surface in
the streaming progress metrics (numDroppedRows) → ops.metrics.

Tested with the in-memory `rate`/file sources; on a cluster the source
is `spark.readStream.format("iceberg")` (or Kafka upstream of it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import DEFAULT, SemlinkConfig
from .linking import candidate_join, generate_mentions


def stream_candidates(transcript_stream: DataFrame, anchors: DataFrame,
                      cfg: SemlinkConfig = DEFAULT,
                      watermark: str = "10 minutes") -> DataFrame:
    """Stateless linking over a streaming transcripts DataFrame.

    Returns a streaming DataFrame of candidate links; attach a sink:

        stream_candidates(s, anchors).writeStream
          .trigger(processingTime="30 seconds")
          .option("checkpointLocation", ckpt)
          .foreachBatch(append_edges).start()
    """
    t = transcript_stream.withWatermark("ts", watermark)
    mentions = generate_mentions(
        t.select("conv_id", "turn_idx", "text"), cfg, streaming=True)
    # keep the event time for windowed downstream aggs
    keyed = mentions.join(
        t.select("conv_id", "turn_idx", "ts"), ["conv_id", "turn_idx"])
    return candidate_join(keyed, anchors, cfg)


def windowed_mention_counts(transcript_stream: DataFrame, anchors: DataFrame,
                            cfg: SemlinkConfig = DEFAULT,
                            watermark: str = "10 minutes",
                            gap: str = "30 minutes") -> DataFrame:
    """Session-windowed per-conversation candidate counts — the
    streaming analogue of the reference's rolling `context` grouping."""
    # stream_candidates already set the watermark on ts; it propagates
    # through the stream-static join (Spark 4 disallows redefining it)
    cands = stream_candidates(transcript_stream, anchors, cfg, watermark)
    return (cands
            .groupBy(F.session_window("ts", gap).alias("w"), "conv_id")
            .agg(F.count("*").alias("n_candidates"),
                 F.approx_count_distinct("target_id").alias("n_entities")))
