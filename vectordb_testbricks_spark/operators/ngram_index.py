"""NGRAM inverted index: infix-LIKE acceleration.

The reference's scalar-index vocabulary includes NGRAM(min_gram, max_gram)
(manifests/schema_matrix_3_0.yaml:25, create_horizon_collection.py:120-141)
— Milvus builds it to serve ``LIKE "%infix%"`` filters, which no columnar
scan can push down. The Spark-first analogue is a batch-built posting table:

    posting(gram, id)  —  distinct character n-grams per document

At query time the pattern's literal runs are cut into grams driver-side;
the posting scan filters to those grams (an ``isin`` that DOES push down to
the posting parquet), candidates are ids containing *all* pattern grams
(count == n_grams aggregate), and the exact LIKE predicate re-verifies the
candidates — so results are bit-identical to the unindexed filter while the
full-text scan is replaced by a posting probe + candidate semi-join. At
100 TB, persist the posting table partitioned/bucketed by gram so the probe
prunes files.

Gram extraction uses the persisted-text barrier: the substring lambda runs
once per position, and an un-materialized upstream expression would be
inlined and re-evaluated per position (HOF lambdas are not CSE'd).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_testbricks_spark.materialize import shared_persist


def char_grams(text: Column, n: int) -> Column:
    """Distinct character n-grams of a string column (positions 1-based;
    strings shorter than n yield an empty array)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - (n - 1), F.lit(0)))
    return F.array_distinct(F.transform(idx, lambda i: text.substr(i, F.lit(n))))


def build_ngram_index(docs: DataFrame, id_col: str, text_col: str,
                      min_gram: int = 3, max_gram: int = 3) -> DataFrame:
    """(gram, id) posting table over character [min_gram, max_gram]-grams.

    Per-row array expressions + one explode — no shuffle; the downstream
    writer decides layout (partitionBy/bucketBy gram for probe pruning).
    """
    txt = shared_persist(
        docs.select(F.col(id_col), F.col(text_col).alias("_txt")))
    grams = F.array_distinct(F.flatten(F.array(*[
        char_grams(F.col("_txt"), n)
        for n in range(min_gram, max_gram + 1)])))
    return (txt.select(F.col(id_col), F.explode(grams).alias("gram")))


def pattern_grams(pattern: str, n: int) -> list[str]:
    """Driver-side: n-grams of the longest wildcard-free literal run of a
    LIKE pattern. Milvus LIKE has only the ``%`` wildcard ('_' is a
    literal — exprlang compiler semantics), so runs split on '%' alone and
    underscores participate in grams. Empty when no run reaches n — the
    index then can't prune and callers fall back to the plain filter."""
    runs = [r for r in pattern.split("%") if len(r) >= n]
    if not runs:
        return []
    run = max(runs, key=len)
    return sorted({run[i: i + n] for i in range(len(run) - n + 1)})


def like_with_index(docs: DataFrame, posting: DataFrame, pattern: str,
                    id_col: str, text_col: str,
                    min_gram: int = 3) -> DataFrame:
    """Exact ``text LIKE pattern`` semantics served through the NGRAM index
    (Milvus LIKE: '%' wildcard only, '_' literal — same lowering as the
    exprlang compiler, so indexed and unindexed filters agree): posting
    probe (pushdown ``isin`` on gram) → all-grams-present candidate
    aggregate → semi-join → exact LIKE re-verification. Falls back to the
    plain filter when the pattern has no literal run ≥ min_gram."""
    from vectordb_testbricks_spark.exprlang.compiler import (
        milvus_like_pattern)
    grams = pattern_grams(pattern, min_gram)
    pred = F.col(text_col).like(milvus_like_pattern(pattern))
    if not grams:
        return docs.filter(pred)
    cands = (posting.filter(F.col("gram").isin(grams))
             .groupBy(id_col)
             .agg(F.count(F.lit(1)).alias("_g"))
             .filter(F.col("_g") >= len(grams))
             .select(id_col))
    return docs.join(F.broadcast(cands), id_col, "left_semi").filter(pred)
