"""Training-data pipeline operators: deduplication, similarity search,
text analysis, multimodal plumbing — the operations a 100 TB
pretraining-data pipeline needs, built Spark-first over the same engine
primitives as the record-linkage core."""
