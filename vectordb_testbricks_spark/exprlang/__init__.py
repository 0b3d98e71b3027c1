"""Milvus-style filter-expression language → ``pyspark.sql.Column`` compiler.

This is the single most important surface of the reference (SURVEY.md §2.2):
every query/delete/search carries a filter-expression string that Milvus
parses server-side. Observed grammar productions P1-P16 (citations into the
reference repo):

  * comparisons ``== != > >= < <=``           (parkey_query_n_search.py:152)
  * combined ranges ``a <= x <= b``           (rewrite_expressions.py:52-66)
  * boolean ``and or not`` / ``&& || !``      (validators.py:57-58)
  * ``in [..]`` / not-in                      (convert_jsonl_to_expressions.py:67-94)
  * ``like`` with % and _ wildcards           (search_permanently.py:108-111)
  * JSON path ``j["a"]["b"] == v``            (search_permanently.py:116-127)
  * array element access ``arr[0] in [..]``   (run_go_bench2.py:32-33)
  * ``array_contains(_any/_all)``             (run_go_bench2.py:36-37)
  * ``json_contains(_any/_all)``              (run_go_bench_horizon.go:114-120)
  * ``ST_CONTAINS(field, 'POLYGON(..)')``     (run_go_bench_horizon.py:98-101)
  * bool equality, quoted-string escaping, empty filter = full scan
    (validators.py:38-42,61-65)

Design: a hand-written lexer + recursive-descent parser build a small AST;
the compiler lowers the AST to built-in Column expressions only (no Python
UDFs), so Catalyst gets full predicate-pushdown / codegen visibility — on a
parquet scan the compiled predicates appear under ``PushedFilters``.
"""

from vectordb_testbricks_spark.exprlang.compiler import compile_expr  # noqa: F401
from vectordb_testbricks_spark.exprlang.parser import parse  # noqa: F401
