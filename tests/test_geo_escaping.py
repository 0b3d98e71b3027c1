"""Geo polygon builder + P14 escaping round-trip (hypothesis)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from vectordb_testbricks_spark.exprlang import compile_expr
from vectordb_testbricks_spark.exprlang.parser import Lit, Cmp, parse
from vectordb_testbricks_spark.functions import geo
from vectordb_testbricks_spark.workload import format_filter_value


def test_square_polygon_matches_reference_formula():
    wkt = geo.square_polygon_wkt("100.0 30.0", 4.0)  # 2 km side
    assert wkt.startswith("POLYGON((") and wkt.endswith("))")
    pts = [tuple(map(float, p.split()))
           for p in wkt[len("POLYGON(("):-2].split(", ")]
    assert len(pts) == 5 and pts[0] == pts[-1]  # closed ring
    lat_off = 1.0 / 111.195
    lon_off = 1.0 / (math.cos(math.radians(30.0)) * 111.195)
    assert pts[0] == (100.0 - lon_off, 30.0 - lat_off)   # SW first
    assert pts[2] == (100.0 + lon_off, 30.0 + lat_off)   # NE third


def test_polygon_feeds_st_contains(spark):
    df = spark.createDataFrame(
        [(1, "POINT (100.0 30.0)"), (2, "POINT (105.0 30.0)")],
        "id long, location string")
    wkt = geo.square_polygon_wkt((100.0, 30.0), 100.0)
    expr = geo.st_contains_expr("location", wkt)
    got = [r["id"] for r in df.filter(compile_expr(expr, df)).collect()]
    assert got == [1]


@given(st.text(min_size=0, max_size=30))
@settings(max_examples=200, deadline=None)
def test_string_escaping_roundtrip(s):
    """Any string literal must survive format → parse (P14)."""
    # newline/control chars round-trip through the \\-escape table
    expr = f"name == {format_filter_value(s)}"
    node = parse(expr)
    assert isinstance(node, Cmp)
    assert isinstance(node.right, Lit)
    assert node.right.value == s


@given(st.one_of(st.integers(-10**12, 10**12), st.booleans(),
                 st.floats(allow_nan=False, allow_infinity=False,
                           width=32)))
@settings(max_examples=100, deadline=None)
def test_scalar_literals_roundtrip(v):
    node = parse(f"x == {format_filter_value(v)}")
    assert isinstance(node.right, Lit)
    assert node.right.value == v or float(node.right.value) == float(v)


def test_escaped_string_filters_spark(spark):
    tricky = 'he said "hi\\there"'
    df = spark.createDataFrame([(1, tricky), (2, "plain")], "id long, s string")
    expr = f"s == {format_filter_value(tricky)}"
    got = [r["id"] for r in df.filter(compile_expr(expr, df)).collect()]
    assert got == [1]
