"""Query-log conversion: condition objects → expression strings → compiled
Spark predicates (the horizonPoc pipeline end-to-end)."""

from __future__ import annotations

import json

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
