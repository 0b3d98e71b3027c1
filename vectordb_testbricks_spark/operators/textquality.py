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
