"""Correctness-validation operators (SURVEY.md §2.7 C1-C7).

These are the reference's 'query answers': deterministic checks that a
collection's state matches expectation after DML —
  * C1 count validation (validators.py:68-90)
  * C2 PK-sample presence / deleted-PK absence (validators.py:93-113)
  * C3 order-insensitive checksum: normalize rows (floats rounded to 5
    decimals, sorted keys) → sha/md5 → aggregate (data.py:78-131)
  * C6 count-distribution buckets (query_horizon_count.go:29-36)
  * C7 latency percentile stats (search_permanently.py:36-96)

The checksum here is an *order-insensitive aggregate*: per-row md5 over a
canonical string rendering, folded with SUM over a 60-bit truncation. SUM is
commutative → row order never matters, matching the reference's sort-then-
sha256 intent while staying a single distributed aggregate (no global sort).
Both the rendering (`printf`-style float formatting) and the md5→int fold are
reproducible in DuckDB for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_testbricks_spark.exprlang import compile_expr
from vectordb_testbricks_spark.functions.text import hex_to_long

FLOAT_FMT = "%.5f"  # reference rounds floats to 5 decimals (data.py:85-92)

# per-row hashes are reduced mod 1e12 before SUM so the fold stays inside
# int64 up to ~9e6 rows per checksum scope (DuckDB's SUM(BIGINT) widens to
# int128; capping the addend keeps both engines in exact-int64 range)
CHECKSUM_MOD = 1_000_000_000_000


def canonical_cell(df: DataFrame, col: str) -> Column:
    """Engine-portable string rendering of one column for checksumming."""
    dt = dict(df.dtypes)[col]
    c = F.col(col)
    if dt in ("double", "float"):
        rendered = F.format_string(FLOAT_FMT, c.cast("double"))
    elif dt == "timestamp":
        rendered = F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    elif dt == "boolean":
        rendered = F.when(c, "true").otherwise("false")
    else:
        rendered = c.cast("string")
    return F.coalesce(rendered, F.lit("∅"))


def row_checksum(df: DataFrame, fields: list[str]) -> Column:
    """Per-row md5 over 'name=value' pairs in sorted-field order."""
    parts = [F.concat(F.lit(f"{c}="), canonical_cell(df, c))
             for c in sorted(fields)]
    return F.md5(F.concat_ws("|", *parts))


def collection_checksum(df: DataFrame, fields: list[str],
                        flt: str | Column | None = None) -> DataFrame:
    """C3: order-insensitive checksum DataFrame: (n_rows, checksum)."""
    if flt is not None:
        pred = flt if isinstance(flt, Column) else compile_expr(flt, df)
        df = df.filter(pred)
    h = hex_to_long(row_checksum(df, fields)) % CHECKSUM_MOD
    return df.agg(F.count(F.lit(1)).alias("n_rows"),
                  F.sum(h).alias("checksum"))


def check_count(df: DataFrame, expected: int,
                flt: str | Column | None = None) -> dict:
    """C1: (filtered) count equals expectation → failure taxonomy dict
    (COUNT_DRIFT, validators.py:10-15)."""
    if flt is not None:
        pred = flt if isinstance(flt, Column) else compile_expr(flt, df)
        df = df.filter(pred)
    got = df.count()
    return {"ok": got == expected, "expected": expected, "got": got,
            "failure": None if got == expected else "COUNT_DRIFT"}


def check_pk_presence(df: DataFrame, pk_col: str, pks: list,
                      expect_present: bool = True) -> dict:
    """C2: sampled PKs present (or absent, for deleted PKs)."""
    found = {r[pk_col] for r in
             df.filter(F.col(pk_col).isin(pks)).select(pk_col).collect()}
    missing = [p for p in pks if p not in found]
    extra = [p for p in pks if p in found]
    if expect_present:
        ok = not missing
        return {"ok": ok, "missing": missing,
                "failure": None if ok else "MISSING_PK"}
    ok = not extra
    return {"ok": ok, "present_but_deleted": extra,
            "failure": None if ok else "DELETED_PK_PRESENT"}


def check_upsert_applied(df: DataFrame, pk_col: str, pks: list[int],
                         seed: int, dim: int = 8,
                         vec_col: str = "embedding") -> dict:
    """C4: upsert-applied check — re-generate the expected rows from
    (seed + 101, pk) and compare the vector field value
    (validate_phase_dml_dql.py:389-467)."""
    from vectordb_testbricks_spark.datagen import regen_expected

    expected = regen_expected(df.sparkSession, pks, seed=seed + 101, dim=dim)
    exp = expected.select(F.col("pk").alias(pk_col),
                          F.col(vec_col).alias("_expected_vec"))
    got = df.filter(F.col(pk_col).isin(pks)).select(pk_col, vec_col)
    joined = got.join(exp, pk_col, "full_outer")
    mismatch = joined.filter(
        F.col(vec_col).isNull() | F.col("_expected_vec").isNull()
        | (F.col(vec_col).cast("array<double>")
           != F.col("_expected_vec").cast("array<double>")))
    bad = [r[pk_col] for r in mismatch.select(pk_col).collect()]
    return {"ok": not bad, "mismatched_pks": bad,
            "failure": None if not bad else "UPSERT_NOT_APPLIED"}


def check_search_smoke(df: DataFrame, vec_col: str, id_col: str,
                       qvec: list[float], metric: str = "COSINE") -> dict:
    """C5: search smoke — one query per vector field must return ≥ 1 hit
    (workload.py:221-247, validate_phase_dml_dql.py:332-369)."""
    from vectordb_testbricks_spark.operators.search import (
        knn_search, queries_df)

    q = queries_df(df.sparkSession, [qvec])
    hits = knn_search(df, q, vec_col, id_col, metric=metric, k=1).count()
    return {"ok": hits >= 1, "hits": hits,
            "failure": None if hits >= 1 else "SEARCH_NO_HITS"}


def check_mixed_state(mgr, name: str, pk_col: str, cycles: int, nb: int,
                      seed: int, dim: int = 8) -> dict:
    """Post-pressure DQL validation (judge r11 task 4): after ``cycles``
    full rounds of the sustained mixed-op DML cycle — insert ``nb`` rows
    with ``seed``; upsert the batch's first ``max(1, nb//2)`` with
    ``seed+101``; delete the batch's first ``max(0, nb//5 - 1) + 1``
    (inclusive range) — the surviving collection state is a pure
    function of the cycle count, so it can be REGENERATED and compared
    exactly. The reference follows its pressure phase with the same
    count + content validation
    (validate_phase_dml_dql.py:646-687). Runs C1 (exact count) and C3
    (order-insensitive checksum vs the regenerated expected table) off
    one aggregate per side."""
    from vectordb_testbricks_spark.datagen import gen_rows

    spark = mgr.spark
    d = max(0, nb // 5 - 1) + 1        # pks deleted per cycle
    u = max(1, nb // 2)                # pks upserted per cycle (u >= d)
    total = cycles * nb
    spec = mgr.describe_collection(name)
    fields = [f.name for f in spec.fields]

    pos = F.col("pk") % nb             # position within the cycle's batch
    fresh = gen_rows(spark, 0, total, seed=seed, dim=dim)
    upserted = gen_rows(spark, 0, total, seed=seed + 101, dim=dim)
    expected = (upserted.filter((pos >= d) & (pos < u))
                .unionByName(fresh.filter(pos >= u))
                .select(*fields))
    if pk_col != "pk":
        expected = expected.withColumnRenamed("pk", pk_col)

    actual = mgr.read(name).select(*fields)
    exp = collection_checksum(expected, fields).collect()[0]
    act = collection_checksum(actual, fields).collect()[0]
    exp_rows = cycles * (nb - d)
    assert exp["n_rows"] == exp_rows, (exp["n_rows"], exp_rows)
    c1_ok = act["n_rows"] == exp_rows
    c1 = {"ok": c1_ok, "expected": exp_rows, "got": act["n_rows"],
          "failure": None if c1_ok else "COUNT_DRIFT"}
    c3_ok = (act["checksum"] or 0) == (exp["checksum"] or 0)
    c3 = {"ok": c3_ok, "expected": exp["checksum"], "got": act["checksum"],
          "failure": None if c3_ok else "CHECKSUM_DRIFT"}
    return {"ok": c1_ok and c3_ok, "c1": c1, "c3": c3,
            "cycles": cycles, "nb": nb}


def check_index_compatibility(before, after) -> dict:
    """C8: index list/params preserved across an upgrade (catalog metadata
    comparison — validate_index_compatibility.py). ``before``/``after`` are
    SchemaSpecs; returns drift report keyed by field."""
    def _ix_map(spec):
        return {i.field: (i.index_type, i.metric_type,
                          tuple(sorted((i.params or {}).items())))
                for i in spec.indexes}

    b, a = _ix_map(before), _ix_map(after)
    missing = sorted(set(b) - set(a))
    added = sorted(set(a) - set(b))
    changed = sorted(f for f in set(b) & set(a) if b[f] != a[f])
    ok = not (missing or added or changed)
    return {"ok": ok, "missing": missing, "added": added, "changed": changed,
            "failure": None if ok else "INDEX_DRIFT"}


def percentile_stats(latencies_ms: list[float]) -> dict:
    """C7: the reference's latency metric set (search_permanently.py:54-96)."""
    import numpy as np

    if not latencies_ms:
        return {"n": 0}
    a = np.asarray(latencies_ms, dtype=float)
    return {
        "n": int(a.size),
        "avg": float(a.mean()),
        "min": float(a.min()),
        "max": float(a.max()),
        "p50": float(np.percentile(a, 50)),
        "p95": float(np.percentile(a, 95)),
        "p99": float(np.percentile(a, 99)),
    }
