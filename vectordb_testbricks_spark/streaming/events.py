"""Streaming pipeline over the events table.

Batch and streaming share one transformation function (the Structured
Streaming contract: the same DataFrame expression tree runs incrementally) —
``windowed_counts`` is used by the batch oracle query (st_window_agg) and by
``run_stream`` with a file source + watermark for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_testbricks_spark.streaming._time import ensure_event_time_ltz


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str | None = None) -> DataFrame:
    """Tumbling-window count/sum per event_type. With a watermark the same
    plan runs under readStream in append mode (event time normalized to LTZ
    first — Spark 4 NTZ parquet inference is not watermarkable)."""
    ev = events
    if watermark:
        ev = ensure_event_time_ltz(ev, "ts").withWatermark("ts", watermark)
    return (ev.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("total"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "cnt", "total"))


def run_stream(spark: SparkSession, source_dir: str, checkpoint_dir: str,
               out_dir: str, window: str = "1 hour",
               watermark: str = "2 hours"):
    """File-source streaming job: parquet in → windowed aggregate → parquet
    out, exactly-once via checkpoint. ``availableNow`` processes the current
    backlog then stops (test-friendly); remove for a continuous run."""
    schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_counts(stream, window=window, watermark=watermark)
    return (agg.writeStream
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start(out_dir))
