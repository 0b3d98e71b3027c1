"""DuckDB-SQL emitter for the Milvus filter-expression AST.

The differential-testing twin of :mod:`compiler`: the same parsed AST
lowers to a DuckDB boolean expression, so ANY expression the engine
accepts can be cross-checked against an independent SQL engine on the
same data — not just the hand-curated oracle strings in the driver
registry. Randomized differential coverage lives in
tests/test_expr_differential.py.

Scope: the scalar/array core (comparisons, combined ranges, and/or/not,
in / not-in, Milvus LIKE, ARRAY_CONTAINS / _ANY / _ALL, array_length,
array element access, starts_with, bool equality, empty filter). JSON
paths, geo, and the gated TEXT_MATCH keep their curated oracles — their
SQL encodings are engine-shaped enough that a generic emitter would just
re-implement the curated strings.

Semantics parity notes (each mirrors a compiler.py decision):
  * Milvus LIKE knows only ``%``; ``_``/``\\`` are literals. The emitted
    pattern routes through the same :func:`milvus_like_pattern` escaping
    and pins ``ESCAPE '\\'`` (DuckDB has no default escape char).
  * Array element access is 0-based in Milvus/Spark (`getItem`), 1-based
    in DuckDB lists — the emitter shifts the index.
  * ``==`` → ``=``, ``!=`` → ``<>``; three-valued NULL logic then agrees
    between Spark filters and SQL WHERE by construction.
"""

from __future__ import annotations

from vectordb_testbricks_spark.exprlang import parser as ast
from vectordb_testbricks_spark.exprlang.compiler import milvus_like_pattern


class SqlGenError(ValueError):
    """Expression uses a surface outside the emitter's scope."""


def _lit(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (int, float)):
        return repr(v)
    raise SqlGenError(f"unsupported literal {v!r}")


def _ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _path(node: ast.Path) -> str:
    sql = _ident(node.name)
    for a in node.accessors:
        if not isinstance(a, int):
            raise SqlGenError(
                f"non-integer accessor {a!r} (JSON paths keep curated "
                "oracles)")
        sql = f"{sql}[{a + 1}]"   # DuckDB lists are 1-based
    return sql


def _operand(node) -> str:
    if isinstance(node, ast.Lit):
        return _lit(node.value)
    if isinstance(node, ast.Path):
        return _path(node)
    if isinstance(node, ast.ListLit):
        return "(" + ", ".join(_lit(v) for v in node.items) + ")"
    if isinstance(node, ast.Call) and node.func in _CALLS:
        # value-typed calls (array_length) appear as comparison operands
        return _CALLS[node.func](node.args)
    raise SqlGenError(f"unsupported operand {node!r}")


def _list_sql(node) -> str:
    """A ListLit as a DuckDB list value (for list_has_any/_all)."""
    if not isinstance(node, ast.ListLit):
        raise SqlGenError(f"expected list literal, got {node!r}")
    return "[" + ", ".join(_lit(v) for v in node.items) + "]"


_CMP = {"==": "=", "!=": "<>", ">": ">", ">=": ">=", "<": "<", "<=": "<="}

_CALLS = {
    "array_contains": lambda a: (
        f"list_contains({_operand(a[0])}, {_operand(a[1])})"),
    "array_contains_any": lambda a: (
        f"list_has_any({_operand(a[0])}, {_list_sql(a[1])})"),
    "array_contains_all": lambda a: (
        f"list_has_all({_operand(a[0])}, {_list_sql(a[1])})"),
    "array_length": lambda a: f"len({_operand(a[0])})",
    "starts_with": lambda a: (
        f"starts_with({_operand(a[0])}, {_operand(a[1])})"),
}


def to_sql(node) -> str:
    """Lower a parsed filter AST to a DuckDB boolean expression."""
    if isinstance(node, ast.TrueLit):
        return "TRUE"
    if isinstance(node, ast.And):
        return f"({to_sql(node.left)} AND {to_sql(node.right)})"
    if isinstance(node, ast.Or):
        return f"({to_sql(node.left)} OR {to_sql(node.right)})"
    if isinstance(node, ast.Not):
        return f"(NOT {to_sql(node.operand)})"
    if isinstance(node, ast.Cmp):
        return (f"({_operand(node.left)} {_CMP[node.op]} "
                f"{_operand(node.right)})")
    if isinstance(node, ast.In):
        neg = "NOT " if node.negated else ""
        return f"({_operand(node.operand)} {neg}IN {_operand(node.items)})"
    if isinstance(node, ast.Like):
        pat = _lit(milvus_like_pattern(node.pattern))
        return f"({_operand(node.operand)} LIKE {pat} ESCAPE '\\')"
    if isinstance(node, ast.Call):
        fn = _CALLS.get(node.func)
        if fn is None:
            raise SqlGenError(
                f"function {node.func!r} keeps its curated oracle")
        return fn(node.args)
    # a bare boolean column used as a predicate
    if isinstance(node, ast.Path):
        return _path(node)
    raise SqlGenError(f"unsupported node {node!r}")


__all__ = ["to_sql", "SqlGenError"]
