"""PySpark-native analytics engine with the query/data-processing surface of
``yanliang567/vectordb-testbricks`` (a Milvus/Turbopuffer test-brick harness).

The reference drives a vector database; this package re-expresses that query
surface — collections of (vector + scalar) rows, ANN top-k search with scalar
filtering, hybrid multi-vector fusion, BM25 full-text search, a Milvus-style
filter-expression language, DML (insert/upsert/partial-update/delete-by-
filter), partitions, deterministic datagen and validation operators — as
idiomatic PySpark DataFrame plans, letting Catalyst/Tungsten pick physical
strategies.

Spark-first design notes:
  * Everything is a DataFrame transformation; no driver-side row loops.
  * The filter language compiles to ``pyspark.sql.Column`` trees so predicate
    pushdown / partition pruning / codegen are free.
  * Distance, BM25, MinHash, SimHash etc. are built-in-function expression
    trees (JVM-side, whole-stage-codegen) — no Python UDFs in hot paths.
"""

__version__ = "0.1.0"

from vectordb_testbricks_spark.session import get_spark  # noqa: F401
from vectordb_testbricks_spark.catalog import load_tables, Collection  # noqa: F401
from vectordb_testbricks_spark.exprlang import compile_expr  # noqa: F401
