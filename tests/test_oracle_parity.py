"""Driver-style correctness gate: run every queries() entry and its DuckDB
oracle side-by-side, compare row count, schema (column names) and exact
values (order-insensitive, columns sorted by name) — a stricter local twin of
CORRECTNESS_r{N}.json."""

from __future__ import annotations

import math

import pandas as pd
import pytest

import __spark_entry__ as E

QUERIES = E.queries()
ORACLES = E.oracle_sql()


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
    sdf = normalize(QUERIES[name](spark, SF_DIR).toPandas())
    odf = normalize(duck.execute(ORACLES[name]).df())
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
