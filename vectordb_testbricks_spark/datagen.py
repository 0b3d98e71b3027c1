"""Deterministic seeded data generation (SURVEY.md §2.6 G1-G5).

Reference: every generated value is a pure function of (seed, pk) so any
validator can re-derive the expected value later
(``milvus_client/common/data.py:134-213``); vectors come from
``Random(seed + pk)`` L2-normalized (data.py:18-24); the same idea drives
upsert-equality checks with seed+101 (validate_phase_dml_dql.py:389-467).

Spark design: ``spark.range(start, end)`` + deterministic column expressions.
Randomness is an md5-keyed hash of (seed, pk[, dim]) — fully distributed,
no Python in the loop, and bit-for-bit reproducible in the DuckDB oracle
(portable md5→int, see functions/text.py).

Value semantics mirror the reference generator:
    int fields      pk % modulus           (category: pk % 1024)
    float fields    (pk % 1000) / 10.0
    bool            pk % 2 == 0
    varchar         f"{name}_{pk}"
    partition key   f"tenant_{pk % 16}"
    json            {"pk": pk, "bucket": pk % 16, "checksum": f"json_{pk}"}
    array           [pk % 8, (pk+1) % 8]
    nullable        NULL when pk % 10 == 0
    vector          unit-normalized hash-noise, dim d
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_testbricks_spark.functions.text import md5_long

# hash-noise granularity: uniform in [-1, 1] with 2e6+1 distinct values
_NOISE_MOD = 2_000_001


def hash_unit(seed: int, *keys: Column) -> Column:
    """Deterministic uniform value in [-1, 1] keyed by (seed, *keys)."""
    key = F.concat_ws("_", F.lit(str(seed)), *[k.cast("string") for k in keys])
    return (md5_long(key) % _NOISE_MOD - (_NOISE_MOD - 1) / 2) \
        / ((_NOISE_MOD - 1) / 2.0)


def gen_vector_fast(seed: int, pk: Column, dim: int,
                    normalize: bool = True) -> Column:
    """Bench-scale sibling of :func:`gen_vector`: xxhash64 noise instead of
    md5-string chains — same distribution and determinism contract (pure
    function of (seed, pk, i)), ~8× cheaper to evaluate. For 1M-row
    scale-evidence corpora where generator cost must not pollute the
    pipeline under test (the same argument dd_minhash_1m makes for its
    xxhash64 words). NOT oracle-portable (DuckDB has no xxhash64);
    registry queries keep :func:`gen_vector`."""
    half = (_NOISE_MOD - 1) / 2.0
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (F.pmod(F.xxhash64(F.lit(seed), pk, i),
                          F.lit(_NOISE_MOD)) - half) / half)
    if not normalize:
        return raw
    return F.aggregate(
        F.transform(raw, lambda x: x * x),
        F.lit(0.0), lambda a, v: a + v,
        lambda s: F.transform(raw, lambda x: x / F.sqrt(s)))


def gen_vector(seed: int, pk: Column, dim: int, normalize: bool = True) -> Column:
    """G2: stable per-pk vector — hash noise per (seed, pk, i), L2-normalized
    like the reference's float vectors (data.py:18-24).

    The norm is bound via ``aggregate``'s *finish* lambda: higher-order
    function bodies are evaluated per element with no common-subexpression
    hoisting, so the naive ``transform(raw, x -> x / sqrt(sum(raw²)))``
    re-evaluates the whole O(dim) norm — dim md5s — for every element,
    O(dim²) md5s per row. Binding the accumulated sum to the finish
    lambda's variable evaluates it once; raw costs two passes total."""
    raw = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                      lambda i: hash_unit(seed, pk, i))
    if not normalize:
        return raw
    return F.aggregate(
        F.transform(raw, lambda x: x * x),
        F.lit(0.0), lambda a, v: a + v,
        lambda s: F.transform(raw, lambda x: x / F.sqrt(s)))


def rows_from_ids(ids: DataFrame, seed: int = 42, dim: int = 8,
                  null_every: int = 10) -> DataFrame:
    """The seeded field menagerie projected from an ``id`` column — a pure
    per-row transform, so it applies identically to a batch ``spark.range``
    (:func:`gen_rows`) and to an unbounded streaming source (the rate-source
    ingest stream in streaming/ingest.py): same id ⇒ same row either way."""
    pk = F.col("id")
    return ids.select(
        pk.alias("pk"),
        (pk % 1024).alias("category"),
        (pk % 127).cast("int").alias("int32_1"),
        ((pk % 1000) / 10.0).alias("float_1"),
        (pk % 2 == 0).alias("bool_1"),
        F.concat(F.lit("varchar_"), pk.cast("string")).alias("varchar_1"),
        F.concat(F.lit("tenant_"), (pk % 16).cast("string")).alias("partition_key"),
        F.concat(F.lit('{"pk": '), pk.cast("string"),
                 F.lit(', "bucket": '), (pk % 16).cast("string"),
                 F.lit(', "checksum": "json_'), pk.cast("string"),
                 F.lit('"}')).alias("json_1"),
        F.array(pk % 8, (pk + 1) % 8).alias("array_int64"),
        F.when(pk % null_every == 0, F.lit(None).cast("string"))
         .otherwise(F.concat(F.lit("text_"), pk.cast("string")))
         .alias("nullable_text"),
        gen_vector(seed, pk, dim).alias("embedding"),
    )


def gen_rows(spark: SparkSession, start_id: int, count: int, seed: int = 42,
             dim: int = 8, null_every: int = 10) -> DataFrame:
    """G1/G3: seeded row batch with the reference's field menagerie.

    Columns mirror the F1 fixture schema (FIXTURES.md):
    pk, category, int8-ish small int, float/double, bool, varchar,
    partition key, JSON string, int array, nullable text, embedding.
    """
    return rows_from_ids(spark.range(start_id, start_id + count),
                         seed=seed, dim=dim, null_every=null_every)


def regen_expected(spark: SparkSession, pks: list[int], seed: int,
                   dim: int = 8) -> DataFrame:
    """C4: re-derive expected rows for sampled pks (upsert-applied checks use
    seed+101 — validate_phase_dml_dql.py:598-604)."""
    lo, hi = min(pks), max(pks)
    return (gen_rows(spark, lo, hi - lo + 1, seed=seed, dim=dim)
            .filter(F.col("pk").isin(pks)))


def expand_data(df: DataFrame, copies: int, pk_col: str,
                stride: int | None = None) -> DataFrame:
    """G5: scale-out expansion — replicate the dataset `copies`× with
    remapped PKs (horizonPoc/expand_data.py). Cross join against a tiny
    range: no shuffle, output partitions scale with input."""
    if stride is None:
        stride = (df.agg(F.max(pk_col)).collect()[0][0] or 0) + 1
    dup = df.crossJoin(F.broadcast(
        df.sparkSession.range(copies).select(F.col("id").alias("_copy"))))
    return dup.withColumn(
        pk_col, F.col(pk_col) + F.col("_copy") * F.lit(stride)).drop("_copy")
