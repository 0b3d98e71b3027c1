"""Streaming pipelines: windowed aggregation (batch/stream shared plan) and
stateful sessionization (applyInPandasWithState vs declarative batch twin)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vectordb_testbricks_spark.streaming.events import (
    run_stream, windowed_counts)
from vectordb_testbricks_spark.streaming.sessionize import (
    run_sessionize_stream, sessionize_batch)


def test_windowed_counts_batch(tables):
    ev = tables["events"].df
    agg = windowed_counts(ev, "1 hour")
    total = agg.agg(F.sum("cnt")).collect()[0][0]
    assert total == ev.count()


@pytest.mark.stream
def test_windowed_stream_matches_batch(spark, tables, tmp_path):
    ev = tables["events"].df.select("event_id", "user_id", "event_type",
                                    "ts", "value")
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    q = run_stream(spark, src, str(tmp_path / "cp"), str(tmp_path / "out"),
                   window="1 hour", watermark="2 hours")
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    want = windowed_counts(spark.read.parquet(src), "1 hour")
    # append-mode emits only watermark-closed windows → subset of batch
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows and got_rows <= want_rows


def test_sessionize_batch_semantics(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 5.0),
        (1, "2024-01-01 10:10:00", 3.0),   # same session (gap 10m)
        (1, "2024-01-01 11:30:00", 2.0),   # new session (gap 80m)
        (2, "2024-01-01 09:00:00", 1.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {(r["user_id"], r["session_idx"]): (r["n_events"], r["total_value"])
           for r in sessionize_batch(ev, gap_minutes=30).collect()}
    assert out == {(1, 0): (2, 8.0), (1, 1): (1, 2.0), (2, 0): (1, 1.0)}


@pytest.mark.slow
@pytest.mark.stream
def test_sessionize_stream_matches_batch(spark, tables, tmp_path):
    ev = (tables["events"].df
          .filter(F.col("user_id") < 50)
          .select("user_id", "ts", "value"))
    src = str(tmp_path / "sess_src")
    ev.write.parquet(src)
    q = run_sessionize_stream(spark, src, str(tmp_path / "sess_cp"),
                              "sessions_out", gap_minutes=30,
                              watermark="1 minute")
    q.awaitTermination(180)
    got = spark.table("sessions_out")
    want = sessionize_batch(spark.read.parquet(src), gap_minutes=30)

    # closed sessions must match the batch twin exactly on (user, start):
    # n_events/end/total identical
    g = {(r["user_id"], r["session_start"]): (r["session_end"], r["n_events"],
                                              round(r["total_value"], 4))
         for r in got.collect()}
    w = {(r["user_id"], r["session_start"]): (r["session_end"], r["n_events"],
                                              round(r["total_value"], 4))
         for r in want.collect()}
    assert g, "stream emitted no sessions"
    for k, v in g.items():
        assert w.get(k) == v, f"session {k}: stream {v} != batch {w.get(k)}"


@pytest.mark.stream
def test_dedup_stream_matches_batch_distinct(spark, tables, tmp_path):
    """Streaming watermarked dedup must emit each (user_id, event_type) key
    exactly once, and the emitted key set must equal the batch distinct."""
    from vectordb_testbricks_spark.streaming.dedup_stream import (
        dedup_batch, run_dedup_stream)

    ev = (tables["events"].df
          .filter(F.col("user_id") < 50)
          .select("user_id", "event_type", "ts"))
    src = str(tmp_path / "dd_src")
    ev.write.parquet(src)
    q = run_dedup_stream(spark, src, str(tmp_path / "dd_cp"),
                         str(tmp_path / "dd_out"),
                         key_cols=["user_id", "event_type"],
                         watermark="2 hours")
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "dd_out"))
    keys = [(r["user_id"], r["event_type"]) for r in got.collect()]
    assert len(keys) == len(set(keys)), "a key was emitted more than once"
    want = {(r["user_id"], r["event_type"]) for r in
            dedup_batch(spark.read.parquet(src),
                        ["user_id", "event_type"]).collect()}
    assert set(keys) == want
