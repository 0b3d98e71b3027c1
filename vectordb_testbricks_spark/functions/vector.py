"""Dense/sparse vector distance expressions.

The reference searches with metrics L2 / IP / COSINE / HAMMING / BM25
(``manifests/schema_matrix_2_6.yaml:72-81``). Here each metric is a pure
Column expression over ``array<float>`` columns — ``zip_with`` +
``aggregate`` stay inside whole-stage codegen, so brute-force scoring runs at
JVM speed with no Python in the loop.

Numeric discipline: elements are cast to double *before* multiplication and
accumulated left-to-right in double, which matches DuckDB's
``list_dot_product(CAST(a AS DOUBLE[]), ...)`` bit-for-bit — required for the
DuckDB correctness oracle to hash-match.

L2 convention: Milvus's L2 metric returns the *squared* euclidean distance;
``l2_sq`` follows that (reference search params, workload.py:140-152).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Inner product (Milvus metric IP)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_sq(a: Column, b: Column) -> Column:
    """Squared euclidean distance (Milvus metric L2)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity (Milvus metric COSINE; higher = closer).

    ``try_divide``, not ``/``: under ANSI (Spark 4 default) a zero-norm
    (all-zero or empty) vector would raise DIVIDE_BY_ZERO and kill the
    whole query — one corrupt row poisoning every search. NULL instead,
    which ranking excludes (search._ranked), matching DuckDB's x/0 → NULL
    so the oracle twin agrees row-for-row."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def l2_normalize(a: Column) -> Column:
    """Unit-normalize a double array: x / ||x||. Normalizing once per row
    turns pairwise cosine into a single dot product (the flop-dominant path
    in O(n²) near-dup joins).

    The norm is bound through ``aggregate``'s finish lambda: HOF bodies are
    evaluated per element without common-subexpression hoisting, so the
    naive ``transform(a, x -> x / norm(a))`` re-evaluates the O(d) norm for
    every element — O(d²) per row (see datagen.gen_vector for the same
    fix).

    ``try_divide`` for the same reason as cosine_sim: a zero-norm stored
    vector in an IVF build or embed-dedup input must not DIVIDE_BY_ZERO
    the whole job under ANSI — it normalizes to NULL elements, scores
    NULL downstream, and never ranks."""
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
        lambda s: F.transform(a, lambda x: F.try_divide(x, F.sqrt(s))))


def hamming_sign(a: Column, b: Column) -> Column:
    """HAMMING distance over sign-bit binarization of two float vectors.

    The reference's BINARY_VECTOR is a packed bit vector searched with
    HAMMING (schema_matrix_2_6.yaml:63,80; packing at 2.6/common.py:317-325).
    We binarize by sign (>= 0 → 1), the standard embedding binarization, and
    count disagreeing bits. Pure integer expression, oracle-reproducible.
    """
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: ((x >= 0).cast("int") != (y >= 0).cast("int")).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def pack_sign_bits(a: Column) -> Column:
    """BINARY_VECTOR packing: sign-binarize a float vector and pack bits
    into 32-bit words → ``array<bigint>`` (the reference packs bits to bytes,
    2.6/common.py:317-325; words are the compute-friendly Spark layout —
    one integer op covers 32 dims). Bit j of word w = [a[32w + j] >= 0].

    Packing is a reverse-order accumulate (acc·2 + bit), which needs no
    variable shift and stays far from int64 overflow (ANSI mode throws on
    wrap, so 64-bit words with a sign bit would be unsafe)."""
    return F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(a) / 32).cast("int") - 1),
        lambda w: F.aggregate(
            F.reverse(F.slice(a, w * 32 + 1, 32)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc * 2
            + F.when(x >= 0, F.lit(1).cast("bigint"))
               .otherwise(F.lit(0).cast("bigint"))))


def hamming_packed(a: Column, b: Column) -> Column:
    """HAMMING distance over packed bit-word arrays: popcount(xor) per word,
    summed — 64 dims per integer op instead of one comparison per dim."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v.cast("bigint"),
    )


def sparse_dot_map(a: Column, b: Column) -> Column:
    """Inner product of two MapType(int/str -> float) sparse vectors
    (SPARSE_FLOAT_VECTOR, reference data.py:57-59): sum over the key
    intersection of products."""
    return F.aggregate(
        F.map_values(F.map_zip_with(a, b, lambda _, x, y: x * y)),
        F.lit(0.0),
        lambda acc, v: acc + F.coalesce(v, F.lit(0.0)),
    )


METRICS = {
    "L2": (l2_sq, "asc"),
    "IP": (dot, "desc"),
    "COSINE": (cosine_sim, "desc"),
    "HAMMING": (hamming_sign, "asc"),
}


def score_expr(metric: str, a: Column, b: Column) -> tuple[Column, bool]:
    """Return (score column, ascending?) for a metric name."""
    fn, order = METRICS[metric.upper()]
    return fn(a, b), order == "asc"
