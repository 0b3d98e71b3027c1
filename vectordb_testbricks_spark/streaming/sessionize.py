"""Custom stateful streaming operator: gap-based sessionization.

The one genuinely stateful transformation a training-data event pipeline
needs that windowed aggregation can't express: group events into sessions
that close after ``gap`` minutes of inactivity per user.

Two implementations with identical semantics:

* ``sessionize_batch`` — declarative twin (lag + cumulative session index
  over a window); the correctness oracle, pure built-ins, runs at any scale
  with one shuffle on user_id.
* ``sessionize_stream`` — Structured Streaming ``applyInPandasWithState``:
  per-user GroupState holds the open session (start, last_ts, n, total);
  closed sessions are emitted as soon as a later event proves the gap, and
  event-time timeout (watermark) flushes sessions the stream stopped
  hearing about. This is the 100-TB path: state is per-key-bounded, the
  shuffle is the groupBy(user_id), and late data is governed by the
  watermark.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from vectordb_testbricks_spark.streaming._time import ensure_event_time_ltz


def sessionize_batch(events: DataFrame, gap_minutes: int = 30,
                     user_col: str = "user_id",
                     ts_col: str = "ts",
                     value_col: str = "value") -> DataFrame:
    """Batch sessionization: (user_id, session_idx, session_start,
    session_end, n_events, total_value). session_idx is 0-based per user in
    time order; a session breaks when the gap to the previous event exceeds
    ``gap_minutes``."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    prev = F.lag(ts_col).over(w)
    new_session = (prev.isNull()
                   | (F.unix_timestamp(F.col(ts_col))
                      - F.unix_timestamp(prev) > gap_s))
    withidx = events.withColumn(
        "session_idx",
        F.sum(new_session.cast("bigint")).over(w) - 1)
    return (withidx.groupBy(user_col, "session_idx")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col(value_col).cast("decimal(18,2)"))
                  .cast("double").alias("total_value")))


SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

# state: open session per user
_STATE_SCHEMA = T.StructType([
    T.StructField("start", T.DoubleType()),    # epoch seconds
    T.StructField("last", T.DoubleType()),
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def _us(epoch_s: float) -> pd.Timestamp:
    """Epoch seconds → microsecond-exact Timestamp (Arrow-safe: the ns→us
    cast in the state serializer rejects sub-microsecond remainders)."""
    return pd.Timestamp(round(epoch_s * 1_000_000), unit="us")


def _session_fn(gap_minutes: int):
    gap_s = gap_minutes * 60.0

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": user_id,
                "session_start": _us(start),
                "session_end": _us(last),
                "n_events": n, "total_value": total}])
            return

        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0

        closed = []
        events = pd.concat(list(pdfs))
        events = events.sort_values("ts")
        for ts, value in zip(events["ts"], events["value"]):
            t = ts.timestamp()
            if start is None:
                start = last = t
                n, total = 1, float(value)
            elif t - last > gap_s:
                closed.append((start, last, n, total))
                start = last = t
                n, total = 1, float(value)
            else:
                last = max(last, t)
                n += 1
                total += float(value)
        state.update((start, last, n, total))
        # event-time timeout: close the open session once the watermark
        # passes last + gap
        state.setTimeoutTimestamp(int((last + gap_s) * 1000))
        if closed:
            yield pd.DataFrame([{
                "user_id": user_id,
                "session_start": _us(s),
                "session_end": _us(e),
                "n_events": cnt, "total_value": tot}
                for s, e, cnt, tot in closed])

    return fn


def sessionize_stream(events_stream: DataFrame, gap_minutes: int = 30,
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization over a stream with (user_id, ts, value).

    Emits each session exactly once when it closes (gap proven by a later
    event, or event-time timeout once the watermark passes)."""
    return (ensure_event_time_ltz(events_stream, "ts")
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _session_fn(gap_minutes),
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def run_sessionize_stream(spark: SparkSession, source_dir: str,
                          checkpoint_dir: str, out_table: str,
                          gap_minutes: int = 30,
                          watermark: str = "2 hours"):
    """File-source driver: parquet events in → closed sessions to a memory
    sink (test harness) with availableNow semantics."""
    schema = spark.read.parquet(source_dir).schema
    stream = (spark.readStream.schema(schema).parquet(source_dir)
              .select("user_id", "ts", "value"))
    sessions = sessionize_stream(stream, gap_minutes, watermark)
    return (sessions.writeStream
            .format("memory").queryName(out_table)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
