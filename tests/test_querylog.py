"""Query-log conversion: condition objects → expression strings → compiled
Spark predicates (the horizonPoc pipeline end-to-end)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from vectordb_testbricks_spark import querylog as QL
from vectordb_testbricks_spark.exprlang import compile_expr


def test_combined_range():
    expr = QL.condition_to_expression(
        {"timestamp": {"$gte": 1700000000, "$lte": 1700003600}})
    assert expr == "1700000000 <= timestamp <= 1700003600"


def test_single_sided_and_equality():
    assert QL.condition_to_expression({"timestamp": {"$gte": 5}}) == \
        "timestamp >= 5"
    assert QL.condition_to_expression({"expert_collected": True}) == \
        "expert_collected == true"
    assert QL.condition_to_expression({"type_model": "m1"}) == \
        'type_model == "m1"'


def test_in_notin_and_array_ops():
    expr = QL.condition_to_expression(
        {"device_id": {"$in": ["a", "b"]},
         "tag_id": {"$in": ["t1"], "contains_all": ["t2", "t3"]},
         "sensor_lidar_type": {"$not_in": ["x", "y"]}},
        field_map=QL.HORIZON_FIELD_MAP,
        array_fields=QL.HORIZON_ARRAY_FIELDS)
    assert expr == (
        'device_id in ["a", "b"] and '
        'ARRAY_CONTAINS_ANY(timeline_tags, ["t1"]) and '
        'ARRAY_CONTAINS_ALL(timeline_tags, ["t2", "t3"]) and '
        'sensor_lidar_type != "x" and sensor_lidar_type != "y"')


def test_field_renames():
    expr = QL.condition_to_expression(
        {"longitude": {"$gte": 100.0, "$lte": 101.5}},
        field_map=QL.HORIZON_FIELD_MAP)
    assert expr == "100.0 <= gcj02_lon <= 101.5"


def test_rewrite_range_expression():
    assert QL.rewrite_range_expression(
        "gcj02_lon >= 100.1 and gcj02_lon <= 101.2 and x == 1") == \
        "100.1 <= gcj02_lon <= 101.2 and x == 1"
    # different columns are not merged
    s = "a >= 1 and b <= 2"
    assert QL.rewrite_range_expression(s) == s


def test_convert_jsonl_and_compile(spark):
    lines = [
        json.dumps({"timestamp": {"$gte": 10, "$lte": 20},
                    "device_id": {"$in": ["d1", "d3"]}}),
        json.dumps({"expert_collected": False}),
        json.dumps({"tag_id": {"contains_all": ["a", "b"]}}),
        "",
        json.dumps({}),
    ]
    exprs = QL.convert_jsonl(lines, QL.HORIZON_FIELD_MAP,
                             QL.HORIZON_ARRAY_FIELDS)
    assert len(exprs) == 4
    assert exprs[-1] == ""  # empty condition = full scan (P15)

    df = spark.range(100).select(
        F.col("id").alias("timestamp"),
        F.concat(F.lit("d"), (F.col("id") % 5).cast("string")).alias("device_id"),
        (F.col("id") % 2 == 0).alias("expert_collected"),
        F.array(F.lit("a"), F.lit("b"), F.lit("c")).alias("timeline_tags"))
    counts = [df.filter(compile_expr(e, df)).count() for e in exprs]
    # ids in [10,20] with id%5 ∈ {1,3} → {11,13,16,18}; 50 falses; all rows
    # contain a∧b; empty expr = full scan
    assert counts == [4, 50, 100, 100]


@pytest.mark.slow
def test_converted_conditions_always_compile(spark):
    """Property: ANY condition object built from the converter's supported
    operator vocabulary converts to an expression that parses and compiles
    against a matching schema — the G4 guarantee that a real query log
    never produces an uncompilable expression. Values fuzz over ints,
    floats, bools and strings (incl. quotes/backslashes, the P14 escaping
    surface)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    df = spark.range(1).select(
        F.col("id").alias("num_a"),
        F.col("id").cast("double").alias("num_b"),
        (F.col("id") == 0).alias("flag"),
        F.lit("s").alias("name"),
        F.array(F.lit("x")).alias("tags"))

    scalar = st.one_of(
        st.integers(min_value=-10**9, max_value=10**9),
        st.floats(allow_nan=False, allow_infinity=False,
                  min_value=-1e9, max_value=1e9),
        st.booleans(),
        st.text(alphabet=st.sampled_from(list(
            'abc XYZ09_%."\\\'[]()')), max_size=8))
    range_spec = st.fixed_dictionaries(
        {}, optional={"$gte": scalar, "$lte": scalar,
                      "$eq": scalar, "$ne": scalar})
    in_spec = st.fixed_dictionaries(
        {}, optional={"$in": st.lists(scalar, min_size=1, max_size=3),
                      "$not_in": st.lists(scalar, min_size=1, max_size=3)})
    arr_spec = st.fixed_dictionaries(
        {}, optional={
            "$in": st.lists(scalar, min_size=1, max_size=3),
            "contains_all": st.lists(scalar, min_size=1, max_size=3)})

    cond = st.fixed_dictionaries({}, optional={
        "num_a": range_spec, "num_b": range_spec,
        "flag": st.booleans(), "name": in_spec, "tag_id": arr_spec})

    @settings(max_examples=200, deadline=None)
    @given(cond)
    def check(c):
        expr = QL.rewrite_range_expression(QL.condition_to_expression(
            c, field_map={"tag_id": "tags"}, array_fields={"tag_id"}))
        if expr:
            compile_expr(expr, df)  # must not raise

    check()
