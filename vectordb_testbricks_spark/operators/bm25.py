"""BM25 full-text search (SURVEY.md §2.4 V7).

Reference semantics: a collection-level *function* maps a text field to a
``sparse_bm25`` SPARSE_FLOAT_VECTOR output field (schema.py:336-346,
schema_matrix_2_6.yaml:65-69); searching that field with metric BM25 and a
raw-string query returns top-k scored documents
(validate_phase_dml_dql.py:332-369; Turbopuffer analogue tpuffer/fts_query.go).

Spark design — BM25 as two batch tables + one score expression:

    tf(doc, term, dl)  per-row array expression + one explode  [NO shuffle]
    df(term), N, avgdl one groupBy over distinct doc-terms     [one shuffle]
    score(q, d) = Σ_{t∈q} idf(t) · tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))

The per-query plan filters the tf table to the query's terms FIRST (broadcast
semi-join on a handful of terms), so idf/score math runs only on matching
rows, then partial-aggregates the per-doc sum. The tf table is the
materialized analogue of Milvus's server-computed function field — build it
once at ingest (``term_frequencies``) and pass it in for the production path.
idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (Lucene/Milvus BM25 variant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_testbricks_spark.exprlang import compile_expr

K1 = 1.2
B = 0.75

#: Matched-stream row bound below which the contrib aggregate may share
#: one exchange with the top-k window (bm25_search_many ``n_docs`` hint):
#: the one-exchange path drops map-side partial aggregation, which is
#: only safe when the un-aggregated (query, doc, term) match stream is
#: provably small. Each (doc, query-term-occurrence) pair matches at most
#: once, so n_docs × Σ|query terms| is a hard upper bound on the stream.
BOUNDED_ONE_EXCHANGE_MAX = 2_000_000


def _tokens(docs: DataFrame, id_col: str, text_col: str,
            analyzer: dict | None = None) -> DataFrame:
    """(id, _toks) — persisted token barrier (HOF lambdas don't CSE; plan
    equality means tf and stats share one cached materialization; a
    different analyzer produces a different plan → its own cache entry)."""
    from vectordb_testbricks_spark.functions.text import materialized_tokens
    return materialized_tokens(docs, id_col, text_col,
                               analyzer_params=analyzer)


def term_frequencies(docs: DataFrame, id_col: str, text_col: str,
                     analyzer: dict | None = None) -> DataFrame:
    """The materialized BM25 'function field': (id, term, tf, dl).
    ``analyzer`` is the field's reference-shape analyzer_params.

    Row-local tf: for each distinct token, count its occurrences in the doc's
    own array — one projection + one explode, zero shuffles (the earlier
    explode→groupBy×2→join shape shuffled the token stream three times)."""
    tk = _tokens(docs, id_col, text_col, analyzer)
    toks = F.col("_toks")
    pairs = F.transform(
        F.array_distinct(toks),
        lambda u: F.struct(
            u.alias("term"),
            F.size(F.filter(toks, lambda x: x == u)).alias("tf")))
    return (tk.select(id_col, F.size(toks).alias("dl"),
                      F.explode(pairs).alias("p"))
            .select(id_col, F.col("p.term").alias("term"),
                    F.col("p.tf").alias("tf"), "dl"))


def corpus_stats(docs: DataFrame, id_col: str, text_col: str,
                 analyzer: dict | None = None) -> DataFrame:
    """(term, df_t, n_docs, avgdl) — the tiny IDF side, broadcastable.
    One groupBy over per-doc distinct terms; N/avgdl from doc lengths alone
    (no token explosion)."""
    tk = _tokens(docs, id_col, text_col, analyzer)
    totals = tk.agg(F.count(F.lit(1)).alias("n_docs"),
                    F.avg(F.size("_toks")).alias("avgdl"))
    df_t = (tk.select(F.explode(F.array_distinct(F.col("_toks"))).alias("term"))
            .groupBy("term").agg(F.count(F.lit(1)).alias("df_t")))
    return df_t.crossJoin(F.broadcast(totals))


def bm25_contrib() -> Column:
    """Per-(doc, term) BM25 contribution over (tf, dl, df_t, n_docs, avgdl)."""
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5))
    tf_part = (F.col("tf") * (K1 + 1.0)) / (
        F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl")))
    return idf * tf_part


def bm25_score_components(tf_df: DataFrame, stats: DataFrame,
                          id_col: str) -> DataFrame:
    """Join tf × stats and emit the per-(doc, term) BM25 contribution."""
    return (tf_df.join(F.broadcast(stats), "term")
            .select(id_col, "term", bm25_contrib().alias("contrib")))


def bm25_search(docs: DataFrame, query_text: str, id_col: str, text_col: str,
                k: int = 10, flt: str | Column | None = None,
                tf_df: DataFrame | None = None,
                stats: DataFrame | None = None,
                analyzer: dict | None = None,
                n_docs: int | None = None) -> DataFrame:
    """V7: top-k documents for a raw-string query (query_id = 0).

    Pass pre-built ``tf_df``/``stats`` to reuse the ingest-time tables (the
    production path); otherwise they are derived on the fly. ``analyzer``
    (reference analyzer_params shape) applies to both corpus and query —
    pre-built tables must have been built with the same analyzer.
    ``n_docs`` is the optional corpus-size hint (see bm25_search_many).
    Returns (query_id, <id_col>, score, rank), ties broken by id.
    """
    return bm25_search_many(docs, [query_text], id_col, text_col, k=k,
                            flt=flt, tf_df=tf_df, stats=stats,
                            analyzer=analyzer, n_docs=n_docs)


def bm25_search_many(docs: DataFrame, query_texts: list[str], id_col: str,
                     text_col: str, k: int = 10,
                     flt: str | Column | None = None,
                     tf_df: DataFrame | None = None,
                     stats: DataFrame | None = None,
                     analyzer: dict | None = None,
                     n_docs: int | None = None) -> DataFrame:
    """V7 at the reference's operating shape — nq query strings per call
    (search_permanently.py:99-101 drives batches of query vectors; the FTS
    analogue is a batch of raw strings). ``query_id`` = position in
    ``query_texts``.

    query_id is carried as a *relation attribute*, never a literal: a
    foldable query_id would let Catalyst constant-fold the final top-k
    window's partition spec away (WindowExec "No Partition Defined"), and
    the per-query ranking must stay partitioned by query at any nq.

    ``n_docs`` is a cheap caller-supplied corpus-size hint (same
    convention as ``dedup.ngram_candidate_pairs(n_docs=)`` /
    ``materialize.barrier_if_large``): when it PROVES the matched
    (query, doc, term) stream small — n_docs × Σ|query term occurrences|
    ≤ :data:`BOUNDED_ONE_EXCHANGE_MAX` is a hard upper bound, since each
    (doc, term occurrence) matches at most once — the contrib aggregate
    is re-keyed by ``repartition("query_id")`` so the aggregate's
    clustered distribution on (query_id, id) AND the top-k window's
    distribution on (query_id) ride ONE exchange instead of two (guide
    §2.4; the same shape fusion._fuse_sum pins). Dropping map-side
    partial aggregation is what the bound pays for; with no hint, or an
    at-scale corpus, the classic partial-agg two-exchange plan is kept —
    there the matched stream is the posting-match stream and shipping it
    raw would be a scale regression (r12 "not yet optimized" #3).
    """
    if flt is not None:
        pred = flt if isinstance(flt, Column) else compile_expr(flt, docs)
        docs = docs.filter(pred)
        tf_df = stats = None  # stats must reflect the filtered corpus
    if tf_df is None:
        tf_df = term_frequencies(docs, id_col, text_col, analyzer)
    if stats is None:
        stats = corpus_stats(docs, id_col, text_col, analyzer)
    # tokenize each query DRIVER-side with the same analyzer (py_tokenize
    # is the Column path's exact twin); duplicate terms count once per
    # occurrence (standard BM25 treats query tf multiplicatively; Milvus
    # sums per occurrence — we keep each occurrence). Literal terms buy
    # two things over the previous in-plan tokenize: one fewer Spark job
    # per search, and an isin() prefilter whose In(term, ...) predicate
    # REACHES THE tf SCAN — on a parquet tf sidecar at corpus scale this
    # prunes row groups by min/max stats instead of probing every posting
    # through the broadcast join (plan guard: tests/test_plans.py).
    from vectordb_testbricks_spark.functions.text import (
        analyzer_kwargs, py_tokenize)
    spark = docs.sparkSession
    kw = analyzer_kwargs(analyzer)
    qterm_rows = [(qid, t) for qid, text in enumerate(query_texts)
                  for t in py_tokenize(text, **kw)]
    qterms_df = spark.createDataFrame(qterm_rows,
                                      "query_id int, term string")
    all_terms = sorted({t for _, t in qterm_rows})
    # every query analyzed to zero terms: nothing can match (isin with an
    # empty list is invalid, so short-circuit explicitly)
    pre = (F.col("term").isin(all_terms) if all_terms else F.lit(False))
    matched = tf_df.filter(pre).join(F.broadcast(qterms_df), "term")
    contribs = (matched.join(F.broadcast(stats), "term")
                .select("query_id", id_col, bm25_contrib().alias("contrib")))
    bounded = (n_docs is not None
               and n_docs * max(len(qterm_rows), 1)
               <= BOUNDED_ONE_EXCHANGE_MAX)
    if bounded:
        contribs = contribs.repartition("query_id")
    scored = (contribs.groupBy("query_id", id_col)
              .agg(F.sum("contrib").alias("score")))
    from vectordb_testbricks_spark.operators.search import _ranked
    return _ranked(scored, id_col, asc=False, k=k)
