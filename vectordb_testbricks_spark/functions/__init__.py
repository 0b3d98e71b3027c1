"""Expression-level function library (all built-in Spark functions, no UDFs).

- ``vector``: dense/sparse distance + similarity expressions (L2, IP, COSINE,
  HAMMING-on-signs) used by the search operators.
- ``text``: tokenization, portable 64-bit hashing (md5-derived, identical in
  Spark and DuckDB — used wherever an oracle must reproduce our hashes),
  n-gram/shingle helpers.
"""

from vectordb_testbricks_spark.functions.vector import (  # noqa: F401
    dot, l2_sq, cosine_sim, hamming_sign, to_double_array,
)
from vectordb_testbricks_spark.functions.text import (  # noqa: F401
    tokenize, md5_long, TOKEN_SPLIT_RE,
)
