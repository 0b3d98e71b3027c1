"""Continuous ingest (streaming/ingest.py): file/rate sources micro-batched
through foreachBatch into the collection manager — the Spark-native twin of
the reference's insert_slowly/upsert loop bricks."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vectordb_testbricks_spark.datagen import gen_rows, rows_from_ids
from vectordb_testbricks_spark.manager import CollectionManager
from vectordb_testbricks_spark.schema import FieldSpec, SchemaSpec
from vectordb_testbricks_spark.streaming.ingest import (
    gen_stream, ingest_until, stream_ingest)


@pytest.fixture
def mgr(spark, tmp_path):
    return CollectionManager(spark, str(tmp_path / "wh"))


def _mk(mgr, name):
    spec = SchemaSpec(name, [
        FieldSpec("id", "INT64", primary=True),
        FieldSpec("category", "INT64"),
        FieldSpec("name", "VARCHAR", max_length=64, nullable=True),
    ])
    mgr.create_collection(spec)
    return spec


def _rows(spark, n, start=0, tag="a"):
    return spark.range(start, start + n).select(
        "id", (F.col("id") % 10).alias("category"),
        F.concat(F.lit(f"{tag}_"), F.col("id")).alias("name"))


def test_rows_from_ids_is_gen_rows_batch_twin(spark):
    """Same ids ⇒ bit-identical rows whether generated batch-side
    (spark.range) or from any id-bearing source (the streaming path)."""
    a = gen_rows(spark, 100, 50, seed=7, dim=4).collect()
    b = rows_from_ids(spark.range(100, 150), seed=7, dim=4).collect()
    assert a == b


def test_gen_stream_schema_matches_batch_generator(spark):
    s = gen_stream(spark, rows_per_second=10, seed=7, dim=4)
    assert s.isStreaming
    # rate-source value is nullable where range ids are not — compare
    # names and types, not nullability
    b = gen_rows(spark, 0, 1, seed=7, dim=4)
    assert [(f.name, f.dataType) for f in s.schema] \
        == [(f.name, f.dataType) for f in b.schema]


@pytest.mark.stream
def test_stream_insert_drains_file_source(spark, mgr, tmp_path):
    _mk(mgr, "col_si")
    src = str(tmp_path / "src")
    _rows(spark, 30).write.parquet(src)
    stream = (spark.readStream
              .schema(_rows(spark, 1).schema).parquet(src))
    q = stream_ingest(mgr, "col_si", stream, str(tmp_path / "cp"),
                      mode="insert")
    q.awaitTermination(120)
    assert mgr.read("col_si").count() == 30


@pytest.mark.stream
def test_stream_upsert_is_idempotent_across_batches(spark, mgr, tmp_path):
    """Two file batches with overlapping PKs: upsert mode converges to
    latest-write-wins, no duplicates — the foreachBatch-replay safety
    property."""
    _mk(mgr, "col_su")
    src = tmp_path / "src"
    src.mkdir()
    _rows(spark, 20, start=0, tag="old").coalesce(1) \
        .write.parquet(str(src / "b0"))
    stream = (spark.readStream
              .schema(_rows(spark, 1).schema).parquet(str(src / "*")))
    q = stream_ingest(mgr, "col_su", stream, str(tmp_path / "cp"),
                      mode="upsert")
    q.awaitTermination(120)
    # second drop: rows 10..29 overwrite the 10..19 overlap
    _rows(spark, 20, start=10, tag="new").coalesce(1) \
        .write.parquet(str(src / "b1"))
    q2 = stream_ingest(mgr, "col_su", stream, str(tmp_path / "cp"),
                       mode="upsert")
    q2.awaitTermination(120)
    got = {r.id: r.name for r in mgr.read("col_su").collect()}
    assert len(got) == 30
    assert got[5] == "old_5" and got[15] == "new_15" and got[25] == "new_25"


@pytest.mark.stream
def test_stream_ingest_transform_filters_before_sink(spark, mgr, tmp_path):
    """A quality gate inside the micro-batch: only category < 5 lands."""
    _mk(mgr, "col_tf")
    src = str(tmp_path / "src")
    _rows(spark, 40).write.parquet(src)
    stream = (spark.readStream
              .schema(_rows(spark, 1).schema).parquet(src))
    q = stream_ingest(mgr, "col_tf", stream, str(tmp_path / "cp"),
                      mode="insert",
                      transform=lambda df: df.filter(F.col("category") < 5))
    q.awaitTermination(120)
    got = mgr.read("col_tf")
    assert got.count() == 20
    assert got.agg(F.max("category")).collect()[0][0] == 4


@pytest.mark.stream
def test_checkpoint_resume_skips_committed_batches(spark, mgr, tmp_path):
    """Restarting with the same checkpoint does not re-ingest drained files
    (insert mode would duplicate if offsets were not honored)."""
    _mk(mgr, "col_cp")
    src = str(tmp_path / "src")
    _rows(spark, 25).write.parquet(src)
    stream = (spark.readStream
              .schema(_rows(spark, 1).schema).parquet(src))
    for _ in range(2):   # second run: checkpoint says "nothing new"
        q = stream_ingest(mgr, "col_cp", stream, str(tmp_path / "cp"),
                          mode="insert")
        q.awaitTermination(120)
    assert mgr.read("col_cp").count() == 25


@pytest.mark.slow
@pytest.mark.stream
def test_rate_source_continuous_upsert(spark, mgr, tmp_path):
    """The insert-slowly brick end-to-end: rate-source entity stream,
    processingTime cadence, bounded by ingest_until; every landed row is
    bit-identical to the batch generator at the same id (G2 stability)."""
    spec = SchemaSpec("col_rate", [
        FieldSpec("pk", "INT64", primary=True),
        FieldSpec("category", "INT64"),
        FieldSpec("varchar_1", "VARCHAR", max_length=64),
    ])
    mgr.create_collection(spec)
    s = gen_stream(spark, rows_per_second=200, seed=9, dim=4) \
        .select("pk", "category", "varchar_1")
    q = stream_ingest(mgr, "col_rate", s, str(tmp_path / "cp"),
                      mode="upsert",
                      trigger={"processingTime": "1 seconds"})
    assert ingest_until(q, min_batches=2, timeout_sec=90)
    got = mgr.read("col_rate")
    n = got.count()
    assert n > 0
    ids = [r.pk for r in got.select("pk").collect()]
    want = {r.pk: r.varchar_1
            for r in gen_rows(spark, min(ids), max(ids) - min(ids) + 1,
                              seed=9, dim=4).collect()}
    assert all(r.varchar_1 == want[r.pk]
               for r in got.select("pk", "varchar_1").collect())


@pytest.mark.stream
def test_stream_appends_into_persisted_ivf(spark, tables, tmp_path):
    """Index freshness under ingest: micro-batches foreachBatch-appended to
    a persisted IVF (no retrain); full-probe search over the grown layout
    equals exact KNN over the union."""
    from vectordb_testbricks_spark.functions.vector import to_double_array
    from vectordb_testbricks_spark.operators.ann_index import (
        append_ivf, build_ivf, ivf_search, read_ivf, write_ivf)
    from vectordb_testbricks_spark.operators.search import knn_search
    emb = tables["embeddings"].df
    old = emb.filter(F.col("vec_id") < 250)
    new = emb.filter(F.col("vec_id") >= 250)
    path = str(tmp_path / "ivf")
    write_ivf(build_ivf(old, "embedding", "vec_id", n_lists=4, seed=7), path)
    src = str(tmp_path / "src")
    new.write.parquet(src)
    stream = spark.readStream.schema(new.schema).parquet(src)
    q = (stream.writeStream
         .foreachBatch(lambda b, _i: append_ivf(b, path, "embedding",
                                                "vec_id"))
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    queries = (emb.filter(F.col("vec_id") == 0)
               .select(F.col("vec_id").alias("query_id"),
                       to_double_array(F.col("embedding")).alias("qvec")))
    got = {(r.vec_id, r.rank)
           for r in ivf_search(read_ivf(spark, path, "embedding", "vec_id"),
                               queries, k=10, nprobe=4).collect()}
    want = {(r.vec_id, r.rank)
            for r in knn_search(emb, queries, "embedding", "vec_id",
                                k=10, metric="COSINE").collect()}
    assert got == want


@pytest.mark.stream
def test_stream_ingest_maintains_bm25_sidecar(spark, mgr, tmp_path):
    """Streaming insert through the manager is the same DML path as batch,
    so a collection with a BM25 FunctionSpec gets its tf/doclen sidecar
    appended per micro-batch — search over the sidecar immediately
    reflects streamed docs (the streaming analogue of Milvus computing
    function fields server-side on insert)."""
    from vectordb_testbricks_spark.schema import FunctionSpec
    spec = SchemaSpec("fts_stream", [
        FieldSpec("doc_id", "INT64", primary=True),
        FieldSpec("text", "VARCHAR", max_length=256, enable_analyzer=True),
        FieldSpec("sparse_bm25", "SPARSE_FLOAT_VECTOR"),
    ], functions=[FunctionSpec("fts", "BM25", "text", "sparse_bm25")])
    mgr.create_collection(spec)
    src = str(tmp_path / "fts_src")
    docs = spark.createDataFrame(
        [(1, "spark streams data"), (2, "ducks stream rivers"),
         (3, "spark caches data")],
        "doc_id long, text string").withColumn(
        "sparse_bm25", F.lit(None).cast("map<int,float>"))
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = stream_ingest(mgr, "fts_stream", stream, str(tmp_path / "fts_cp"),
                      mode="insert")
    q.awaitTermination(120)
    from vectordb_testbricks_spark.operators.bm25 import bm25_search
    got = mgr.bm25_search("fts_stream", "spark data", k=3).collect()
    ref = bm25_search(mgr.read("fts_stream"), "spark data", "doc_id",
                      "text", k=3).collect()
    assert [(r.doc_id, round(r.score, 9)) for r in got] \
        == [(r.doc_id, round(r.score, 9)) for r in ref]
    assert {r.doc_id for r in got} == {1, 3}
