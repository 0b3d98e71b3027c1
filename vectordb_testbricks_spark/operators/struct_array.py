"""StructArray / embedding-list element-level operators (3.0-roadmap
prototype).

The reference's 3.0 feature inventory names StructArray as its largest
capability group (docs/plans/2026-07-07-milvus-3-feature-inventory.md
§1 "StructArray / EmbeddingList": element-level query/search,
element-level group_by incl. by primary key, embedding-list search +
element-level filter, nested array operators) and proposes bricks
`struct_array_element_search` / `_element_query` / `_group_by`. No
reference implementation exists — like TEXT_MATCH these are prototypes
of declared roadmap semantics, exercised by tests only (the driver
registry tracks the released 2.6 surface).

Spark realization: a StructArray field IS an ``array<struct<...>>``
column and an embedding list IS ``array<array<float>>`` — both native
Catalyst types, so the element-level surface decomposes into two plan
shapes:

* **entity-scope predicates** stay un-exploded: ``F.exists`` /
  ``F.filter`` higher-order functions evaluate per-row over the array,
  keeping the filter in the scan stage (no join, no shuffle, row count
  never inflated) — this is the shape that survives 100 TB.
* **element-scope results** (hit paths, element top-k) posexplode ONCE
  into ``(entity, element_idx, element)`` and then reuse the standard
  two-phase top-k (WindowGroupLimit) exactly like any V1 search; the
  explode is row-local (scan stage), so cost is O(total elements) with
  no extra exchange before the group-limit prune.

Entity-scope embedding-list search scores MaxSim (best element per
entity, the late-interaction convention): one partial-aggregating
groupBy whose map-side combine collapses each partition's elements to
one row per (query, entity) before the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vectordb_testbricks_spark.functions.vector import (
    score_expr, to_double_array)

__all__ = ["element_exists", "element_filter_hits", "element_count",
           "embedding_list_search"]


def element_exists(arr_col: str | Column, pred) -> Column:
    """Entity-scope element predicate: true when ANY element of the
    StructArray satisfies ``pred`` (a Column-lambda over the element
    struct). Compiles to a higher-order ``exists`` evaluated inside the
    scan stage — the roadmap's "element-level filter" without an
    explode. Equivalent SQL: EXISTS(col, e -> pred(e))."""
    col = F.col(arr_col) if isinstance(arr_col, str) else arr_col
    return F.exists(col, pred)


def element_count(arr_col: str | Column, pred) -> Column:
    """Number of elements satisfying ``pred`` — the validator's
    "element count" ground truth (roadmap: "Validator 不能只按 entity
    count 验证"), still entity-scope/un-exploded."""
    col = F.col(arr_col) if isinstance(arr_col, str) else arr_col
    return F.size(F.filter(col, pred))


def element_filter_hits(base: DataFrame, arr_col: str, id_col: str,
                        pred, element_alias: str = "element") -> DataFrame:
    """Element-scope query: one row per MATCHING element with its hit
    path — ``(id, element_idx, element)`` — the roadmap's element-level
    query result shape (entity + which element hit).

    posexplode preserves the element's position within the stored array
    so the hit path is addressable (``$[idx]``); the predicate is
    applied AFTER the explode on the element struct itself, so arbitrary
    per-element conditions (not just existence) shape the result."""
    e = F.col(element_alias)
    return (base.select(id_col, F.posexplode(arr_col)
                        .alias("element_idx", element_alias))
            .filter(pred(e)))


def embedding_list_search(base: DataFrame, queries: DataFrame,
                          list_col: str, id_col: str,
                          metric: str = "COSINE", k: int = 10,
                          scope: str = "entity",
                          flt: Column | None = None,
                          element_pred=None,
                          radius: float | None = None,
                          range_filter: float | None = None) -> DataFrame:
    """Embedding-list search (roadmap §1 "embedding-list search +
    element-level filter", ``search_scope=entity|element``).

    ``base`` carries ``list_col: array<array<float>>`` (one embedding
    per element); ``queries`` is the standard (query_id, qvec) relation.

    * ``scope="element"``: rank INDIVIDUAL elements — returns
      (query_id, id, element_idx, score, rank) with rank 1..k over all
      elements, the element hit path included (roadmap "element hit
      path" validation).
    * ``scope="entity"``: MaxSim late-interaction — each entity scores
      as its best element; returns (query_id, id, element_idx, score,
      rank) where element_idx is the argmax element. One
      partial-aggregated groupBy (max + argmax via struct-max), then
      the standard two-phase top-k.

    ``flt`` prunes entities before scoring (the V2 discipline);
    ``element_pred`` prunes ELEMENTS (a Column-lambda over the
    embedding array) before scoring — the element-level filter composed
    with search.

    ``radius`` / ``range_filter`` add element-level RANGE search
    (roadmap §1 "element-level range search") with Milvus's parameter
    convention: radius is the outer (worse) score bound, range_filter
    the optional inner (better) one — similarity metrics keep
    ``radius < score <= range_filter``, distance metrics keep
    ``range_filter <= score < radius``. The band applies to ELEMENT
    scores before ranking/aggregation, so at entity scope an entity
    survives only through elements inside the band."""
    if scope not in ("entity", "element"):
        raise ValueError(f"scope must be entity|element, got {scope!r}")
    if flt is not None:
        base = base.filter(flt)
    # posexplode BEFORE the element filter — same order as
    # element_filter_hits — so element_idx always addresses the STORED
    # array position ($[idx] stays resolvable against the row) instead
    # of renumbering within the filtered subset
    exploded = base.select(id_col, F.posexplode(F.col(list_col))
                           .alias("element_idx", "_evec"))
    if element_pred is not None:
        exploded = exploded.filter(element_pred(F.col("_evec")))
    exploded = exploded.crossJoin(F.broadcast(queries))
    score, asc = score_expr(metric, to_double_array(F.col("_evec")),
                            F.col("qvec"))
    scored = exploded.select("query_id", id_col, "element_idx",
                             score.alias("score"))
    if radius is not None:
        scored = scored.filter(F.col("score") < radius if asc
                               else F.col("score") > radius)
    if range_filter is not None:
        scored = scored.filter(F.col("score") >= range_filter if asc
                               else F.col("score") <= range_filter)
    if scope == "element":
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").asc() if asc else F.col("score").desc(),
            F.col(id_col).asc(), F.col("element_idx").asc())
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))
    # entity scope: MaxSim with the argmax element carried via struct
    # ordering. Ties on score break toward the LOWEST element_idx in
    # both directions: min(struct(score, idx)) for ascending metrics,
    # max(struct(score, -idx)) for descending ones.
    if asc:
        pair = F.struct(F.col("score"), F.col("element_idx").alias("_i"))
        best, idx_of = F.min(pair), F.col("_best._i")
    else:
        pair = F.struct(F.col("score"),
                        (-F.col("element_idx")).alias("_i"))
        best, idx_of = F.max(pair), -F.col("_best._i")
    per_entity = (scored.groupBy("query_id", id_col)
                  .agg(best.alias("_best"))
                  .select("query_id", id_col,
                          idx_of.cast("int").alias("element_idx"),
                          F.col("_best.score").alias("score")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").asc() if asc else F.col("score").desc(),
        F.col(id_col).asc())
    return (per_entity.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
