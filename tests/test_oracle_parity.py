"""Driver-style correctness gate: run every queries() entry and its DuckDB
oracle side-by-side, compare row count, schema (column names) and exact
values (order-insensitive, columns sorted by name) — a stricter local twin of
CORRECTNESS_r{N}.json."""

from __future__ import annotations

import math

import pandas as pd
import pytest

import __spark_entry__ as E

# slow tier: the full 50-entry sweep is the pre-commit / bench-gate bar;
# the fast tier (-m "not slow") relies on the per-operator unit tests
pytestmark = pytest.mark.slow

QUERIES = E.queries()
ORACLES = E.oracle_sql()


def dtype_kind(dtype) -> str:
    """Collapse a pandas dtype to the kind the driver's value-hash is
    sensitive to: int vs float vs bool vs everything-else. DuckDB widening
    (SUM(BIGINT) -> HUGEINT -> float64/object in pandas) lands in a
    different kind than Spark's int64 and must fail here — r01 shipped four
    hash-fails this coercing gate masked."""
    s = str(dtype).lower()
    if "bool" in s:
        return "bool"
    if "int" in s:
        return "int"
    if "float" in s or "double" in s:
        return "float"
    return "obj"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "int" in str(df[c].dtype).lower():
            df[c] = df[c].astype("int64")
        elif "float" in str(df[c].dtype) or "double" in str(df[c].dtype):
            df[c] = df[c].astype("float64")
        elif "bool" in str(df[c].dtype).lower():
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(k for k in QUERIES if k in ORACLES))
def test_query_matches_oracle(name, spark, duck):
    from tests.conftest import SF_DIR
    raw_s = QUERIES[name](spark, SF_DIR).toPandas()
    raw_o = duck.execute(ORACLES[name]).df()
    if len(raw_s) and len(raw_o):  # empty frames carry placeholder dtypes
        kinds_s = {c: dtype_kind(raw_s[c].dtype) for c in raw_s.columns}
        kinds_o = {c: dtype_kind(raw_o[c].dtype) for c in raw_o.columns}
        assert kinds_s == kinds_o, \
            f"{name}: dtype-kind drift spark={kinds_s} oracle={kinds_o}"
    sdf = normalize(raw_s)
    odf = normalize(raw_o)
    assert list(sdf.columns) == list(odf.columns), \
        f"{name}: columns {list(sdf.columns)} != {list(odf.columns)}"
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} rows vs {len(odf)}"
    for c in sdf.columns:
        a, b = sdf[c], odf[c]
        if a.dtype == "float64":
            bad = [
                (i, x, y) for i, (x, y) in enumerate(zip(a, b))
                if not ((pd.isna(x) and pd.isna(y)) or x == y
                        or (isinstance(x, float) and isinstance(y, float)
                            and math.isclose(x, y, rel_tol=0, abs_tol=0)))
            ]
        else:
            bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b))
                   if not ((pd.isna(x) and pd.isna(y)) or x == y)]
        assert not bad, f"{name}.{c}: first mismatches {bad[:5]}"


def test_queries_without_oracle_run(spark):
    from tests.conftest import SF_DIR
    for name in sorted(k for k in QUERIES if k not in ORACLES):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"query_id", "vec_id", "score", "rank"} <= set(df.columns)


def test_bm25_oracle_counts_zero_token_docs(spark, tmp_path):
    """A doc that tokenizes to NOTHING (stopword-only text under a stop
    filter) must still count toward n_docs/avgdl in the oracle exactly as
    Spark's corpus_stats counts every doc — the unnested-toks dl CTE this
    replaces silently dropped such docs and diverged."""
    import duckdb
    from vectordb_testbricks_spark.operators.bm25 import bm25_search
    rows = [(1, "spark join fast"), (2, "The a the a"), (3, "spark query")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "docs_parquet")
    docs.coalesce(1).write.parquet(p)
    hits = bm25_search(docs, E.BM25_QUERY, "doc_id", "text", k=10,
                       analyzer=E.BM25_STOP_ANALYZER)
    got = {r["doc_id"]: round(r["score"], 6) for r in hits.collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
    sql = (f"WITH {E._sql_bm25_scored(E.TOKS_STOP_SQL)} "
           "SELECT doc_id, score FROM bm25_scored")
    want = {int(d): round(s, 6) for d, s in con.execute(sql).fetchall()}
    assert got == want and len(got) == 2
