"""Text-analysis operators for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure Column expressions over a text column (portable to the DuckDB
oracle); designed to run inside the parquet scan stage at 100-TB scale —
no shuffle, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_testbricks_spark.functions.text import md5_long, shingles, tokenize

# Tiny function-word dictionaries for the n-gram/stopword language heuristic.
# Deterministic, alphabetical tie-break. Real deployments plug in fastText;
# the Spark plumbing (expression shape, schema) is what matters here.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "of", "and", "is", "to", "in", "that"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un"),
    "zh": ("de", "shi", "le", "zai", "he", "you", "wo", "ta"),
}

EN_STOPWORDS = LANG_STOPWORDS["en"] + ("it", "for", "on", "with", "as", "was")


def token_count(c: Column) -> Column:
    """Whitespace-ish token count (analyzer tokens)."""
    return F.size(tokenize(c))


def bpe_ish_piece_count(c: Column) -> Column:
    """BPE-ish subword estimate: alnum runs + punctuation marks each count as
    a piece, long alnum runs count ceil(len/4) pieces (≈ GPT-style 4 chars
    per token). Pure regexp/aggregate expression."""
    pieces = F.aggregate(
        tokenize(c), F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("bigint"))
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]+", ""))
    return (pieces + punct).alias("bpe_pieces")


def punct_ratio(c: Column) -> Column:
    nonword = F.length(F.regexp_replace(F.lower(c), "[a-z0-9 ]", ""))
    return nonword.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def stopword_ratio(c: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokenize(c)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def mean_token_len(c: Column) -> Column:
    toks = tokenize(c)
    total = F.aggregate(toks, F.lit(0).cast("bigint"),
                        lambda acc, t: acc + F.length(t).cast("bigint"))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_features(docs: DataFrame, id_col: str, text_col: str,
                     extra: dict[str, "Column"] | None = None) -> DataFrame:
    """Quality-signal feature frame: (id, n_chars, n_tokens, punct_ratio,
    stopword_ratio, mean_token_len, quality_score[, extra...]). The
    composite score is a simple monotone blend used for threshold filtering
    (C4-style gate). ``extra`` appends more per-row expressions (e.g. a
    token-count variant) into the SAME scan-stage projection — one pass,
    no join."""
    c = F.col(text_col)
    ntok = token_count(c)
    pr = punct_ratio(c)
    sr = stopword_ratio(c)
    mtl = mean_token_len(c)
    score = (
        F.least(ntok.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(pr * 5.0, F.lit(1.0))) * 0.3
        + F.least(sr * 4.0, F.lit(1.0)) * 0.3
    )
    return docs.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        ntok.alias("n_tokens"),
        pr.alias("punct_ratio"),
        sr.alias("stopword_ratio"),
        mtl.alias("mean_token_len"),
        score.alias("quality_score"),
        *[v.alias(k) for k, v in (extra or {}).items()],
    )


def lang_id(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-overlap language heuristic: per language, count function-word
    hits; argmax with deterministic alphabetical tie-break → (id, lang_pred,
    lang_hits)."""
    toks = tokenize(F.col(text_col))
    langs = sorted(LANG_STOPWORDS)

    def _hits(sw):
        # closure factory: F.filter lambdas must be unary (a second parameter
        # would be bound to the element index)
        return F.size(F.filter(toks, lambda t: t.isin(*sw)))

    hit_cols = [_hits(LANG_STOPWORDS[lg]).alias(f"hits_{lg}") for lg in langs]
    scored = docs.select(F.col(id_col), *hit_cols)
    # argmax via greatest + first-match case (alphabetical order = tie-break)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):
        pred = F.when(F.col(f"hits_{lg}") == best, F.lit(lg)).otherwise(pred)
    return scored.select(F.col(id_col), pred.alias("lang_pred"),
                         best.alias("lang_hits"))


def fingerprints(docs: DataFrame, id_col: str, text_col: str,
                 k: int = 5) -> DataFrame:
    """Document fingerprints: full-content md5 over the canonical token
    stream + a winnowing-style minimum k-gram rolling hash → (id,
    content_md5, min_kgram_hash). Near-identical prefixes/suffixes collide on
    min_kgram_hash; exact bodies collide on content_md5."""
    # tokens materialized first — shingles() re-evaluates its argument inside
    # a HOF lambda, which would re-run the regex split per k-gram position
    tk = docs.select(F.col(id_col), tokenize(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    content = F.md5(F.array_join(toks, " "))
    kgram_hashes = F.transform(shingles(toks, k), lambda s: md5_long(s))
    return tk.select(
        F.col(id_col),
        content.alias("content_md5"),
        F.array_min(kgram_hashes).alias("min_kgram_hash"),
    )


def repetition_features(docs: DataFrame, id_col: str,
                        text_col: str) -> DataFrame:
    """Gopher-style repetition signals → ``(id, dup_token_frac,
    top_bigram_char_frac)`` — the standard quality filters for
    machine-generated / boilerplate text (Rae et al. 2021 §A1.1:
    duplicate-token and top-n-gram character fractions).

      * dup_token_frac       — 1 − distinct/total analyzer tokens
      * top_bigram_char_frac — token characters covered by the most
        frequent token bigram (count × bigram chars, join spaces
        excluded) over total token characters, capped at 1.0

    The token and bigram arrays are computed once and persisted before
    the counting lambdas touch them (the shingles() performance
    contract: HOF lambdas are not CSE'd, so inline arrays would re-split
    per element). The top-bigram count is sort + one linear
    run-tracking aggregate — O(B log B) per row; the first cut
    (count-per-distinct-gram via nested filter, O(B²)) tripled the
    tx_quality headline time at sf0.1. The DuckDB oracle deliberately
    keeps the quadratic formulation: two independent algorithms
    agreeing on the value is a stronger differential than one algorithm
    mirrored twice. No shuffle; all inside whole-stage codegen."""
    t = tokenized_with_bigrams(docs, id_col, text_col)
    return t.select(F.col(id_col),
                    dup_token_frac(F.col("_toks"))
                    .alias("dup_token_frac"),
                    top_bigram_char_frac(F.col("_toks"), F.col("_big"))
                    .alias("top_bigram_char_frac"))


def tokenized_with_bigrams(docs: DataFrame, id_col: str,
                           text_col: str) -> DataFrame:
    """``(id, text, _toks, _big)`` persisted — the shared base for
    repetition signals (and anything else needing both token and sorted
    bigram arrays as column attributes, e.g. the consolidated
    tx_quality projection: one scan, no join)."""
    from vectordb_testbricks_spark.materialize import (
        parallelize_small, shared_persist)
    t = parallelize_small(docs).select(
        F.col(id_col), F.col(text_col),
        tokenize(F.col(text_col)).alias("_toks"))
    t = t.select("*", F.array_sort(shingles(F.col("_toks"), 2))
                 .alias("_big"))
    return shared_persist(t)


def dup_token_frac(toks: Column) -> Column:
    """1 − distinct/total over a materialized token array column."""
    return (F.lit(1.0)
            - F.size(F.array_distinct(toks))
            / F.greatest(F.size(toks), F.lit(1)).cast("double"))


def top_bigram_char_frac(toks: Column, sorted_big: Column) -> Column:
    """Most-frequent-bigram char coverage over total token chars,
    capped at 1.0: coverage = count × token-chars-in-the-bigram
    (the gram's length minus its join spaces — spaces are not document
    characters, and counting them via translate also handles the
    degenerate whole-doc gram of <2-token documents),
    and since overlapping occurrences share tokens the raw product can
    exceed the document (``"a a a a"`` → 3 occurrences × 2 chars over 4
    token chars), so the fraction clamps to 1 — "the whole document is
    this bigram" is the correct reading of saturation for a
    Gopher-style threshold filter. ``sorted_big`` must be SORTED: max
    over bigrams of count×chars == max over sorted equal-runs of
    run_length×chars (coverage only grows within a run) — one linear
    aggregate instead of the O(B²) count-per-distinct-gram nested
    filter."""
    zero = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("best"))

    def _step(a, x):
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(
                            a["best"],
                            run * F.length(F.translate(x, " ", "")))
                        .alias("best"))

    top_cov = F.aggregate(sorted_big, zero, _step, lambda a: a["best"])
    tok_chars = F.aggregate(toks, F.lit(0),
                            lambda a, tkn: a + F.length(tkn))
    return F.least(
        top_cov.cast("double")
        / F.greatest(tok_chars, F.lit(1)).cast("double"), F.lit(1.0))


def run_analyzer(text: str, analyzer_params: dict | None = None) -> list:
    """3.0-roadmap ``run_analyzer`` prototype (feature-inventory doc §3;
    no reference implementation exists): analyze a literal string with a
    field analyzer, returning its token list — the driver-side twin of
    the engine tokenizer, so what this returns is exactly what the
    engine matches against."""
    from vectordb_testbricks_spark.functions.text import (
        analyzer_kwargs, py_tokenize)
    return py_tokenize(text, **analyzer_kwargs(analyzer_params))


def highlight_matches(docs: DataFrame, id_col: str, text_col: str,
                      query: str, *, analyzer_params: dict | None = None,
                      window: int = 3, pre_tag: str = "<em>",
                      post_tag: str = "</em>",
                      max_fragments: int = 1,
                      term_weights: dict | None = None) -> DataFrame:
    """3.0-roadmap query-term highlighter prototype (feature-inventory
    doc §3: "query term highlighter", "highlighter fragment 配置",
    "highlighter score"; no reference implementation exists) →
    ``(id, n_matches, fragments, frag_scores)``.

    The query is analyzed driver-side with the field's analyzer (the
    TEXT_MATCH discipline); per row, the 1-based positions of matching
    tokens are found with one scan-stage higher-order filter, and the
    first ``max_fragments`` matches each yield a constant-length token
    window of ``2·window+1`` (anchored ``window`` tokens before the
    match; at BOTH array edges the window slides rather than shrinks —
    the start offset is clamped into [1, size-2·window]) with matched
    terms wrapped in ``pre_tag``/``post_tag`` (Lucene's default
    highlighter shape). ``frag_scores`` is the Lucene-style fragment
    score: matched-token count inside each window, or — when
    ``term_weights`` maps query terms to weights — the sum of matched
    terms' weights (terms absent from the map default to weight 1.0, so
    partial maps degrade to counting). Documents with no match report
    n_matches=0 and empty fragment arrays; NULL text propagates NULL.
    Everything is per-row Column work over a persisted token array — no
    shuffle, no UDF."""
    from vectordb_testbricks_spark.materialize import (
        parallelize_small, shared_persist)
    kw_terms = run_analyzer(query, analyzer_params)
    if not kw_terms:
        raise ValueError("highlight query analyzed to zero terms")
    from vectordb_testbricks_spark.functions.text import (
        analyzer_kwargs, tokenize)
    kw = analyzer_kwargs(analyzer_params)
    t = shared_persist(parallelize_small(docs).select(
        F.col(id_col), tokenize(F.col(text_col), **kw).alias("_toks")))
    toks = F.col("_toks")

    def _is_term(tok):
        return tok.isin(*kw_terms)

    # positions via the index-aware transform: NULL text propagates NULL
    # (a sequence(1, greatest(size, 1)) formulation collapses NULL to 0
    # matches — greatest swallows the NULL and filter drops the NULL
    # predicate, the same trap the phrase-match differential caught)
    pos = F.filter(
        F.transform(toks, lambda tok, i: F.when(_is_term(tok), i + 1)),
        lambda x: x.isNotNull())

    def _start(p):
        # slide (not shrink) at BOTH edges: left-clamp to 1, right-clamp
        # so the slice still has room for 2*window+1 tokens (short docs
        # degrade to the whole array via the inner greatest)
        return F.least(F.greatest(p - window, F.lit(1)),
                       F.greatest(F.size(toks) - 2 * window, F.lit(1)))

    def _fragment(p):
        win = F.slice(toks, _start(p), 2 * window + 1)
        marked = F.transform(
            win, lambda tok: F.when(
                _is_term(tok),
                F.concat(F.lit(pre_tag), tok, F.lit(post_tag)))
            .otherwise(tok))
        return F.array_join(marked, " ")

    if term_weights is None:
        def _frag_score(p):
            return F.size(F.filter(F.slice(toks, _start(p), 2 * window + 1),
                                   _is_term)).cast("double")
    else:
        wmap = F.create_map(*[F.lit(x) for t, w in term_weights.items()
                              for x in (t, float(w))])

        def _frag_score(p):
            win = F.slice(toks, _start(p), 2 * window + 1)
            return F.aggregate(
                win, F.lit(0.0),
                lambda acc, tok: acc + F.when(
                    _is_term(tok),
                    F.coalesce(wmap[tok], F.lit(1.0))).otherwise(F.lit(0.0)))

    heads = F.slice(pos, 1, max_fragments)
    return t.select(
        F.col(id_col),
        F.size(pos).alias("n_matches"),
        F.transform(heads, _fragment).alias("fragments"),
        F.transform(heads, _frag_score).alias("frag_scores"))
