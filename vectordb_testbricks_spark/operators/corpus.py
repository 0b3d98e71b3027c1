"""Corpus-management operators for training-data pipelines: deterministic
hash-based train/val/test splits.

A split assignment must be (a) deterministic — re-running the pipeline maps
every document to the same split, (b) stable under growth — ingesting new
documents never moves an existing one between splits, and (c) shuffle-free —
at 100 TB the assignment has to happen inside the scan stage, not via a
global sample/sort.  Hashing the primary key and slicing the hash space by
the cumulative ratios gives all three: the expression is a pure per-row
Column (md5 + substring compare), so it rides along with the parquet scan
and any downstream writer can `partitionBy("split")` without an extra pass.

The hash prefix is compared LEXICOGRAPHICALLY against hex boundary strings
computed driver-side in Python.  Lowercase-hex md5 and string comparison
behave identically in Spark and DuckDB, which keeps the operator fully
oracle-checkable without any engine-specific integer parsing (DuckDB has no
``conv(hex, 16, 10)``).

Reference parity: the reference harness materializes static train/eval
subsets by id-range slicing when preparing search/query corpora
(`milvus-bricks/2.6/common.py` insert helpers seed disjoint id ranges); this
module generalizes that to ratio-based, growth-stable splits — the form a
Spark training pipeline actually needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 8  # 32 bits of hash — ratio resolution ~2.3e-10, plenty


def split_boundaries(ratios: dict[str, float]) -> list[tuple[str, str | None]]:
    """Cumulative upper boundaries for each named split, as zero-padded
    lowercase hex strings over the first ``_HEX_DIGITS`` md5 characters.

    Returns ``[(name, upper_bound_hex), ...]`` in insertion order.  The last
    split catches the remainder of the hash space, so its bound is ``None``
    rather than a hex string: every real bound is an 8-char string that
    compares lexicographically against md5 prefixes, and a fake "top of
    space" string could not (any 9-char sentinel sorts BEFORE most 8-char
    prefixes).  Ratios must be positive and sum to ~1.
    """
    if not ratios:
        raise ValueError("ratios must be non-empty")
    total = sum(ratios.values())
    if any(r <= 0 for r in ratios.values()) or abs(total - 1.0) > 1e-6:
        raise ValueError(f"ratios must be positive and sum to 1, got {ratios}")
    space = 16 ** _HEX_DIGITS
    bounds: list[tuple[str, str | None]] = []
    acc = 0.0
    names = list(ratios)
    for name in names:
        acc += ratios[name]
        if name == names[-1]:
            bounds.append((name, None))  # remainder catcher — no upper bound
        else:
            upper = min(space - 1, round(acc * space))
            bounds.append((name, format(upper, f"0{_HEX_DIGITS}x")))
    return bounds


def split_column(key: Column, ratios: dict[str, float]) -> Column:
    """The split-name Column for ``key`` under ``ratios`` — a pure per-row
    expression (md5 prefix vs. precomputed hex boundaries), no shuffle."""
    prefix = F.substring(F.md5(key.cast("string")), 1, _HEX_DIGITS)
    bounds = split_boundaries(ratios)
    expr = F.lit(bounds[-1][0])  # last split catches the remainder
    for name, upper in reversed(bounds[:-1]):
        expr = F.when(prefix < F.lit(upper), F.lit(name)).otherwise(expr)
    return expr


def assign_splits(df: DataFrame, key_col: str,
                  ratios: dict[str, float]) -> DataFrame:
    """``df`` plus a ``split`` column.  Growth-stable: the assignment of a
    row depends only on md5(key), so appending new rows never reassigns
    existing ones (unlike randomSplit/sampling, which reshuffle)."""
    return df.withColumn("split", split_column(F.col(key_col), ratios))


def split_summary(df: DataFrame, key_col: str, ratios: dict[str, float],
                  char_col: str | None = None) -> DataFrame:
    """Per-split corpus accounting: (split, n_docs[, sum_chars]) — the
    sanity readout a pipeline checks after splitting (ratio drift, token
    budget per split).  One map-side-combined groupBy over n_splits keys."""
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if char_col is not None:
        aggs.append(F.sum(F.length(F.col(char_col))).alias("sum_chars"))
    return (assign_splits(df, key_col, ratios)
            .groupBy("split").agg(*aggs).orderBy("split"))


def split_oracle_case(key_sql: str, ratios: dict[str, float]) -> str:
    """The DuckDB CASE expression mirroring :func:`split_column` — generated
    from the same boundaries so Spark and oracle can never drift."""
    prefix = f"substr(md5(CAST({key_sql} AS VARCHAR)), 1, {_HEX_DIGITS})"
    bounds = split_boundaries(ratios)
    whens = "".join(
        f"WHEN {prefix} < '{upper}' THEN '{name}' "
        for name, upper in bounds[:-1])
    return f"CASE {whens}ELSE '{bounds[-1][0]}' END"


# ---------------------------------------------------------- sequence packing

def pack_sequences(df: DataFrame, id_col: str, tok_col,
                   capacity: int, n_parts: int = 32) -> DataFrame:
    """Concat-and-chunk sequence packing for LLM pretraining batches:
    documents are concatenated in deterministic ``id_col`` order and
    chunked into fixed ``capacity``-token training sequences; each
    document is assigned the chunk its first token lands in →
    ``(id, tok_count, chunk)``.

    The assignment is an EXACT global exclusive prefix sum — the one
    operation a naive window (``sum() over (order by id)``) computes on
    a single partition, which is the classic 100-TB bottleneck. Two-phase
    instead: range-partition by id, cumsum per partition (parallel
    windows over spark_partition_id), then add per-partition exclusive
    offsets computed driver-side from the partition totals (bounded:
    one row per partition, n_parts scalars). Deterministic regardless of
    where the range partitioner draws its boundaries — the prefix sum is
    defined by the total id order, not the partitioning.

    ``tok_col`` may be a column name or a Column expression (e.g.
    ``F.size(tokenize(F.col("text")))`` to count analyzer tokens inside
    the scan stage)."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    from pyspark.sql import Window
    tok = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    # NULL token counts (e.g. NULL text under size(tokenize(...))) would
    # NULL a partition total — TypeError in the driver offset fold — and
    # silently skew the window cumsum; a missing document contributes 0.
    d = (df.select(F.col(id_col).alias("id"),
                   F.coalesce(tok.cast("bigint"),
                              F.lit(0)).alias("tok_count"))
         .repartitionByRange(n_parts, "id")
         .select("id", "tok_count",
                 F.spark_partition_id().alias("_pid")))
    d = d.localCheckpoint()  # pin the partitioner draw: _pid must be the
    #                          same in the totals pass and the cumsum pass
    totals = {r["_pid"]: r["t"] for r in
              d.groupBy("_pid").agg(F.sum("tok_count").alias("t"))
              .collect()}
    if not totals:
        # empty input: F.create_map() over zero entries types as
        # map<void,void> and fails analysis — short-circuit with the
        # correctly-typed empty frame instead
        return d.select("id", "tok_count",
                        F.lit(None).cast("bigint").alias("chunk"))
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = (Window.partitionBy("_pid").orderBy("id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    excl = F.sum("tok_count").over(w) - F.col("tok_count") + off[F.col("_pid")]
    return d.select("id", "tok_count",
                    F.floor(excl / capacity).alias("chunk"))


def pack_summary(df: DataFrame, id_col: str, tok_col,
                 capacity: int) -> DataFrame:
    """Per-chunk accounting of :func:`pack_sequences` —
    ``(chunk, n_docs, tok_sum)`` for bounded, oracle-checkable output."""
    packed = pack_sequences(df, id_col, tok_col, capacity)
    return (packed.groupBy("chunk")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("tok_count").alias("tok_sum")))


# ------------------------------------------------- cross-split contamination

def cross_split_contamination(docs: DataFrame, id_col: str, text_col: str,
                              ratios: dict[str, float],
                              train: str = "train", test: str = "test",
                              shingle_n: int = 8,
                              max_df: int = 50) -> DataFrame:
    """Benchmark-decontamination check: which held-out documents share
    rare ``shingle_n``-gram shingles with the training split →
    ``(test_id, n_train_docs, max_shared)`` per contaminated test doc.

    The standard LLM-pipeline hygiene step (decontaminate eval sets
    against pretraining data by long-n-gram overlap), expressed as the
    same inverted-index shape the n-gram dedup uses: per-doc distinct
    shingle codes (scan-stage array expressions, no shuffle), split
    assignment folded into the same scan (md5-interval — zero extra
    passes), then a code-keyed join of test postings against train
    postings. Codes with corpus df > ``max_df`` are dropped first —
    common shingles carry no contamination signal and cap the join
    fan-out (the quadratic head at 100 TB)."""
    from vectordb_testbricks_spark.materialize import shared_persist
    from vectordb_testbricks_spark.operators.dedup import _token_codes

    codes = _token_codes(docs, id_col, text_col, shingle_n)
    # persisted: posts feeds BOTH the df aggregation and the rare join —
    # without the barrier the shingle→md5 explode (the costliest
    # expression here) evaluates twice
    posts = shared_persist(codes.select(
        F.col(id_col),
        split_column(F.col(id_col), ratios).alias("split"),
        F.explode("codes").alias("code")))
    # df-cap computed over the whole corpus (both splits — contamination
    # df is a corpus property, mirroring the dedup max_df convention)
    df_t = posts.groupBy("code").agg(F.count(F.lit(1)).alias("df"))
    rare = shared_persist(
        posts.join(df_t.filter(F.col("df") <= max_df), "code")
        .select(id_col, "split", "code"))
    t = (rare.filter(F.col("split") == test)
         .select(F.col(id_col).alias("test_id"), "code"))
    tr = (rare.filter(F.col("split") == train)
          .select(F.col(id_col).alias("train_id"), "code"))
    shared = (t.join(tr, "code")
              .groupBy("test_id", "train_id")
              .agg(F.count(F.lit(1)).alias("n_shared")))
    return (shared.groupBy("test_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_train_docs"),
                 F.max("n_shared").cast("bigint").alias("max_shared")))
