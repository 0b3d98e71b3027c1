"""Streaming ingest-time deduplication.

The batch dedup family (operators/dedup.py: exact, MinHash, SimHash, n-gram,
embedding-cosine) covers corpus-at-rest cleaning; a training-data pipeline
also needs *ingest-time* exact dedup so repeated deliveries (at-least-once
sources, backfills) never reach the corpus. Structured Streaming expresses
this natively: ``dropDuplicatesWithinWatermark`` keeps per-key state only
inside the watermark horizon, so state size is bounded by key arrival rate ×
delay instead of corpus size — the property that makes this viable on an
unbounded 100-TB/day feed where a full-history key set cannot fit anywhere.

Batch and streaming share the key-derivation expression (the Structured
Streaming contract); the batch twin is the oracle-checkable declarative
equivalent over the same input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_testbricks_spark.streaming._time import ensure_event_time_ltz


def dedup_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Shared projection: the dedup identity key (verbatim columns; callers
    wanting content-hash identity pass a derived column first)."""
    return df.select(*key_cols, "ts")


def dedup_stream(stream: DataFrame, key_cols: list[str],
                 watermark: str = "2 hours") -> DataFrame:
    """Watermarked exact dedup: first arrival per key wins; duplicates
    arriving within ``watermark`` of the first are dropped; state for a key
    is freed once the watermark passes it."""
    return (ensure_event_time_ltz(dedup_keys(stream, key_cols), "ts")
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(key_cols))


def dedup_batch(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Batch twin: the distinct key set (key-only projection keeps the
    result deterministic — *which* duplicate survives is arrival-order in
    streaming, so only the key set is contract)."""
    return dedup_keys(df, key_cols).select(*key_cols).distinct()


def run_dedup_stream(spark: SparkSession, source_dir: str,
                     checkpoint_dir: str, out_dir: str,
                     key_cols: list[str], watermark: str = "2 hours"):
    """File-source streaming dedup job: parquet in → watermarked
    drop-duplicates → parquet out, exactly-once via checkpoint.
    ``availableNow`` drains the backlog then stops (test-friendly)."""
    schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    deduped = dedup_stream(stream, key_cols, watermark=watermark)
    return (deduped.writeStream
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start(out_dir))
