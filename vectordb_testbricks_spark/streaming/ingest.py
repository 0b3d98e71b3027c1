"""Continuous ingest: the Spark-native form of the reference's long-running
insert/upsert bricks (`milvus-bricks/insert_slowly.py:56-70` — nb-row batch
every interval until timeout; `milvus-bricks/upsert.py`,
`milvus-bricks/create_n_insert_until_denied.py` — pump batches until the
server refuses).

The reference drives a client loop: generate nb rows → insert/upsert → sleep.
In Spark that loop IS a Structured Streaming query: an unbounded source
(rate, files, Kafka) micro-batched through ``foreachBatch`` into the
collection manager. The scale story:

- The source is partitioned (rate `numPartitions`, one task per Kafka
  partition / file split), so generation and routing run cluster-wide, not
  on a driver thread like the reference's client loop.
- ``foreachBatch`` gives at-least-once delivery; with ``mode="upsert"`` the
  PK-keyed merge is idempotent, so replays after failure converge — the
  effective semantics are exactly-once without any coordination. Plain
  ``mode="insert"`` appends and stays at-least-once (duplicates possible on
  retry); pair it with a downstream exact-dedup pass or prefer upsert.
- The checkpoint directory carries source offsets: a restarted query resumes
  from the last committed batch, the Spark analogue of the reference loop's
  "continue from num_entities" restart bookkeeping.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vectordb_testbricks_spark.datagen import rows_from_ids
from vectordb_testbricks_spark.manager import CollectionManager


def gen_stream(spark: SparkSession, rows_per_second: int = 100,
               seed: int = 42, dim: int = 8, null_every: int = 10,
               num_partitions: int | None = None) -> DataFrame:
    """Unbounded seeded entity stream: rate-source ``value`` becomes the PK,
    projected through the same deterministic field menagerie as
    ``datagen.gen_rows`` — the streaming twin of the reference's
    ``gen_data_by_collection`` batch generator, so stream-ingested rows are
    bit-identical to batch-generated ones with the same ids."""
    reader = (spark.readStream.format("rate")
              .option("rowsPerSecond", rows_per_second))
    if num_partitions is not None:
        reader = reader.option("numPartitions", num_partitions)
    ids = reader.load().select(F.col("value").alias("id"))
    return rows_from_ids(ids, seed=seed, dim=dim, null_every=null_every)


def stream_ingest(mgr: CollectionManager, name: str, stream_df: DataFrame,
                  checkpoint_dir: str, mode: str = "upsert",
                  partition_name: str | None = None,
                  trigger: dict | None = None,
                  transform: Callable[[DataFrame], DataFrame] | None = None,
                  ) -> StreamingQuery:
    """Micro-batch the stream into a managed collection.

    ``mode="upsert"`` (default) is idempotent by PK — safe under foreachBatch
    replay; ``mode="insert"`` is append-only at-least-once. ``transform``
    runs inside each micro-batch (e.g. a quality filter before ingest).
    ``trigger`` passes through to ``DataStreamWriter.trigger``; the default
    ``availableNow=True`` drains whatever the source has and stops — the
    bounded-run shape (reference bricks bound by ``timeout`` wall clock
    instead). Pass ``{"processingTime": "10 seconds"}`` for the
    insert-slowly cadence.
    """
    if mode not in ("insert", "upsert"):
        raise ValueError(f"mode must be insert|upsert, got {mode!r}")
    sink = mgr.insert if mode == "insert" else mgr.upsert

    def _one_batch(batch_df: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        if batch_df.isEmpty():   # rate source can emit empty micro-batches
            return
        sink(name, batch_df, partition_name=partition_name)

    writer = (stream_df.writeStream.foreachBatch(_one_batch)
              .option("checkpointLocation", checkpoint_dir))
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def graceful_stop(query: StreamingQuery, idle_wait_sec: float = 30.0) -> None:
    """Stop a streaming query without interrupting a foreachBatch mid-flight.

    ``stop()`` interrupts the stream execution thread; if that thread is
    inside a Py4J-backed foreachBatch call, the interrupt surfaces as an
    exception whose message embeds the full Python traceback (tens of KB).
    Spark then regex-scans the message to classify the interruption
    (``StreamExecution.isInterruptionException``), and ``java.util.regex``'s
    recursive loop matching overflows the stack on messages that long — a
    StackOverflowError that kills the stream thread after the batch already
    committed (observed on local[32] at 300 rows/s). Waiting for
    ``isTriggerActive == False`` first means the interrupt lands in the
    trigger executor's sleep instead: a plain, short InterruptedException.
    The idle window between processingTime triggers makes the residual race
    tiny; data is safe either way (foreachBatch commits are idempotent in
    upsert mode), this is about clean shutdown.
    """
    import time
    deadline = time.monotonic() + idle_wait_sec
    while time.monotonic() < deadline and query.isActive:
        if not query.status.get("isTriggerActive", False):
            break
        time.sleep(0.05)
    query.stop()


def ingest_until(query: StreamingQuery, *, min_batches: int | None = None,
                 timeout_sec: float = 60.0) -> bool:
    """Run a continuous ingest query until it has committed
    ``min_batches`` micro-batches (or, with ``min_batches=None``, until it
    finishes on its own), then stop it. Returns True if the target was
    reached — the bounded-run harness the reference expresses as
    ``while time.time() < start + timeout`` (insert_slowly.py:59-70)."""
    import time
    deadline = time.monotonic() + timeout_sec
    if min_batches is None:
        ok = query.awaitTermination(timeout_sec)
        if not ok:
            graceful_stop(query)
        return bool(ok)
    # count only micro-batches that actually ingested rows — a rate source
    # idling between triggers emits EMPTY micro-batches, and those must not
    # satisfy a bounded-ingest target that promises min_batches batches of
    # actual data landed
    rows_by_batch: dict[int, int] = {}
    while time.monotonic() < deadline:
        for prog in query.recentProgress:
            rows_by_batch[prog["batchId"]] = prog["numInputRows"]
        if sum(1 for n in rows_by_batch.values() if n > 0) >= min_batches:
            graceful_stop(query)
            query.awaitTermination(30)
            return True
        if not query.isActive:
            return False
        time.sleep(0.2)
    graceful_stop(query)
    return False
