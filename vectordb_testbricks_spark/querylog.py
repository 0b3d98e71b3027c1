"""Query-log → filter-expression conversion (the horizonPoc pipeline).

Reference behavior (milvus_client/horizonPoc/convert_jsonl_to_expressions.py:
30-132): JSONL query logs carry MongoDB-style condition objects; each becomes
one filter-expression string in the engine's grammar, with

  * ``{"$gte": a, "$lte": b}``       → combined range ``a <= col <= b``
  * ``{"$gte": a}`` / ``{"$lte": b}``→ single-sided comparison
  * ``{"$in": [..]}`` on scalar      → ``col in [..]``
  * ``{"$not_in": [..]}`` on scalar  → conjunction of ``col != v``
  * ``{"$in": [..]}`` on array field → ``ARRAY_CONTAINS_ANY(col, [..])``
  * ``{"contains_all": [..]}``       → ``ARRAY_CONTAINS_ALL(col, [..])``
  * bool / scalar literal            → ``col == value``
  * field renames (source → collection schema), e.g. longitude → gcj02_lon

and the combined-range rewrite (horizonPoc/rewrite_expressions.py:52-66)
normalizing ``col >= a and col <= b`` → ``a <= col <= b``.

This module generalizes the converter: the field map and array-field set are
parameters instead of hardcoded branches, so any query-log schema converts.
Output strings compile through ``exprlang.compile_expr`` → Spark Column.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterable


def _fmt(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        # backslash FIRST: a trailing '\' would otherwise escape the
        # closing quote and emit an unparseable expression (found by the
        # hypothesis round-trip in tests/test_querylog.py)
        escaped = v.replace("\\", "\\\\").replace('"', '\\"')
        return f'"{escaped}"'
    return str(v)


def _fmt_list(vals: Iterable) -> str:
    return "[" + ", ".join(_fmt(v) for v in vals) + "]"


def condition_to_expression(cond: dict, field_map: dict[str, str] | None = None,
                            array_fields: set[str] | None = None) -> str:
    """Convert one condition object to a filter-expression string.

    ``field_map`` renames source fields to collection fields; ``array_fields``
    marks (source-named) fields whose $in must become ARRAY_CONTAINS_ANY.
    Conditions join with " and " in source-key order, matching the reference.
    """
    field_map = field_map or {}
    array_fields = array_fields or set()
    parts: list[str] = []
    for src, spec in cond.items():
        col = field_map.get(src, src)
        if not isinstance(spec, dict):  # literal equality (bool / scalar)
            parts.append(f"{col} == {_fmt(spec)}")
            continue
        has_gte, has_lte = "$gte" in spec, "$lte" in spec
        if has_gte and has_lte:
            parts.append(f"{_fmt(spec['$gte'])} <= {col} <= {_fmt(spec['$lte'])}")
        elif has_gte:
            parts.append(f"{col} >= {_fmt(spec['$gte'])}")
        elif has_lte:
            parts.append(f"{col} <= {_fmt(spec['$lte'])}")
        if "$in" in spec:
            if src in array_fields or col in array_fields:
                parts.append(
                    f"ARRAY_CONTAINS_ANY({col}, {_fmt_list(spec['$in'])})")
            else:
                parts.append(f"{col} in {_fmt_list(spec['$in'])}")
        if "contains_all" in spec:
            parts.append(
                f"ARRAY_CONTAINS_ALL({col}, {_fmt_list(spec['contains_all'])})")
        if "$not_in" in spec:
            for v in spec["$not_in"]:  # reference emits one != per value
                parts.append(f"{col} != {_fmt(v)}")
        if "$eq" in spec:
            parts.append(f"{col} == {_fmt(spec['$eq'])}")
        if "$ne" in spec:
            parts.append(f"{col} != {_fmt(spec['$ne'])}")
    return " and ".join(parts)


# combined-range rewrite (rewrite_expressions.py:52-66), same regex shape
_RANGE_RE = re.compile(r"(\w+) >= ([\d.]+) and \1 <= ([\d.]+)")


def rewrite_range_expression(expr: str) -> str:
    """``col >= a and col <= b`` → ``a <= col <= b`` (all occurrences)."""
    return _RANGE_RE.sub(
        lambda m: f"{m.group(2)} <= {m.group(1)} <= {m.group(3)}", expr)


def convert_jsonl(lines: Iterable[str],
                  field_map: dict[str, str] | None = None,
                  array_fields: set[str] | None = None) -> list[str]:
    """Convert JSONL query-log lines to expression strings (empty condition →
    empty string = full scan, P15)."""
    out = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        cond = json.loads(line)
        out.append(rewrite_range_expression(
            condition_to_expression(cond, field_map, array_fields)))
    return out


# the horizonPoc mapping, kept as a ready-made profile
HORIZON_FIELD_MAP = {
    "longitude": "gcj02_lon",
    "latitude": "gcj02_lat",
    "tag_id": "timeline_tags",
}
HORIZON_ARRAY_FIELDS = {"tag_id", "timeline_tags"}
