"""Arrow-batched numpy kernels for the two HOF-heavy hot paths.

Round-8 instrumentation localized a sticky per-JVM HotSpot pathology to
exactly one stage per scale entry: the interpreted higher-order-function
eval chain (ArrayTransform/aggregate) of (a) the MinHash codes+signature
materialization and (b) the sparse postings build ran at ~16x CPU in
~50% of JVM launches — same stage id, identical plan, every other stage
in the same JVM normal (BASELINE.md r08 section; refuted A/B probes
included the decisive ``wholeStage=false`` floor run). These kernels
re-express those two computations as ``mapInPandas`` numpy/hashlib code:
Arrow-batched (never row-at-a-time Python UDFs), embarrassingly parallel
(zero shuffles — the kernels are per-row work), and immune to JVM JIT
state by construction.

Exactness contract: each kernel is a bit-for-bit twin of its JVM
expression path (tokenize regex, md5-derived 60-bit codes mod
P = 2^31-1, the affine hash family of dedup.hash_params, NULL/empty-text
edge semantics) — asserted by identity tests in
tests/test_arrow_kernels.py and, for the MinHash pipeline, by the
driver's DuckDB oracle row (dd_minhash runs the Arrow path by default).

Reference parity: the signatures these kernels produce feed the same
banded-LSH dedup surface SURVEY.md S2 maps from the reference's
validator family (milvus_client/common/data.py:78-131 checksum shapes);
the postings kernel feeds the SPARSE_INVERTED_INDEX physical tier
(manifests/schema_matrix_2_6.yaml:63,80).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def resolve_impl(impl: str | None, env_var: str, default: str,
                 label: str) -> str:
    """Shared impl-switch resolution for the kernelized operators:
    explicit arg wins, then the env var, then the operator's default;
    anything but 'arrow'/'jvm' raises naming the operator."""
    import os
    impl = impl or os.environ.get(env_var, default)
    if impl not in ("arrow", "jvm"):
        raise ValueError(f"unknown {label} impl {impl!r} "
                         f"(expected 'arrow' or 'jvm')")
    return impl


def _minhash_rows(texts, shingle_n, a_vec, b_vec, p):
    """Per-batch worker: (ids, texts) -> (codes list, sig list) with the
    JVM path's exact semantics. Pure Python/numpy; importable so the
    test suite can probe it without a Spark session."""
    import hashlib

    import numpy as np

    from vectordb_testbricks_spark.functions.text import (
        py_shingles, py_tokenize)

    n_hash = len(a_vec)
    codes_out: list = []
    flat_parts: list = []
    offsets: list = []
    rowkind: list = []            # "np" rows get vectorized sigs
    pos = 0
    for text in texts:
        if text is None:
            # JVM: split(NULL) -> NULL toks. With shingling, the
            # when/otherwise wrapper turns that into [array_join(NULL)]
            # = [NULL] -> codes [NULL]; WITHOUT shingling,
            # transform(NULL) stays NULL -> codes NULL. Either way
            # array_min over NULL/[NULL] is NULL per hash -> sig
            # [NULL]*n.
            codes_out.append([None] if shingle_n else None)
            rowkind.append("null")
            continue
        toks = py_tokenize(text)
        # truthiness, not `is None`: the JVM twin (_token_codes) switches
        # on `if shingle_n`, so shingle_n=0 must also mean raw tokens here
        # (ADVICE r09: `is None` emitted width-0 shingles for 0)
        units = py_shingles(toks, shingle_n) if shingle_n else toks
        if not units:
            # shingle_n=None on an empty token list: transform([]) -> []
            # -> codes []; array_min(transform([], ..)) is NULL per hash
            codes_out.append([])
            rowkind.append("empty")
            continue
        cs = np.unique(np.fromiter(
            (int(hashlib.md5(u.encode("utf-8")).hexdigest()[:15], 16) % p
             for u in units),
            dtype=np.int64, count=len(units)))
        codes_out.append(cs.tolist())
        flat_parts.append(cs)
        offsets.append(pos)
        pos += len(cs)
        rowkind.append("np")
    sigs_np = None
    if flat_parts:
        flat = np.concatenate(flat_parts)
        # (N, H): c*a + b fits int64 (c < 2^31, a <= 2H+1, b < 2^31)
        vals = (flat[:, None] * a_vec + b_vec) % p
        sigs_np = np.minimum.reduceat(vals, np.asarray(offsets), axis=0)
    sig_out: list = []
    k = 0
    for kind in rowkind:
        if kind == "np":
            sig_out.append(sigs_np[k].tolist())
            k += 1
        else:
            sig_out.append([None] * n_hash)
    return codes_out, sig_out


def minhash_codes_sigs(docs: DataFrame, id_col: str, text_col: str,
                       num_hashes: int = 16,
                       shingle_n: int | None = 3,
                       with_sigs: bool = True) -> DataFrame:
    """(id, codes, sig) — the MinHash codes+signature materialization as
    one Arrow-batched kernel pass. ``with_sigs=False`` outputs
    (id, codes) only and skips the affine min-reduction entirely —
    column pruning cannot reach inside mapInPandas, so a codes-only
    consumer (the ngram pipeline) must opt out explicitly or it pays
    the (N, num_hashes) hash matrix for nothing (review r09 #2).

    Twin of ``dedup._token_codes`` + ``dedup.signatures_from_codes``:
    same tokenizer (functions.text.py_tokenize == tokenize), same shingle
    rule (short docs emit their full join), same md5-derived 60-bit codes
    mod P, same affine family (dedup.hash_params), same NULL-text edges
    (codes [NULL], sig [NULL]*n). The affine min-reduction is vectorized
    numpy over the batch's flattened code arrays (``minimum.reduceat``);
    only the md5 of each distinct shingle is a per-string C call.
    """
    from vectordb_testbricks_spark.operators.dedup import P, hash_params

    params = hash_params(num_hashes) if with_sigs else []
    a_list = [a for a, _ in params]
    b_list = [b for _, b in params]
    fields = [
        T.StructField(id_col, docs.schema[id_col].dataType),
        T.StructField("codes", T.ArrayType(T.LongType())),
    ]
    if with_sigs:
        fields.append(T.StructField("sig", T.ArrayType(T.LongType())))
    out_schema = T.StructType(fields)

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        a_vec = np.asarray(a_list, dtype=np.int64)
        b_vec = np.asarray(b_list, dtype=np.int64)
        for pdf in batches:
            codes, sigs = _minhash_rows(
                pdf[text_col].tolist(), shingle_n, a_vec, b_vec, P)
            out = {id_col: pdf[id_col], "codes": codes}
            if with_sigs:
                out["sig"] = sigs
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(gen, out_schema)


def jaccard_arrow(joined: DataFrame, a_col: str = "ca",
                  b_col: str = "cb") -> DataFrame:
    """Exact Jaccard over two code-array columns as an Arrow-batched
    kernel: input rows carry the joined candidate pair with both docs'
    code arrays; output replaces them with a ``jaccard`` double.

    Twin of the JVM expression in ``dedup.jaccard_pairs``
    (``size(array_intersect)/size(array_union)`` with NULL-array rows
    yielding NULL): codes are distinct per doc by construction, so set
    intersection/union sizes match Spark's array semantics exactly, incl.
    a NULL *element* matching a NULL element (Spark's array_intersect is
    null-safe-equal). Arrow→pandas converts an ``array<bigint>`` that
    CONTAINS a null into a float64 array whose null is NaN — and
    ``NaN != NaN`` would silently unmatch what the JVM null-safe-matches
    (review r09 #1, caught by executing both impls on [NULL] codes) —
    so elements normalize to int/None before the set ops (float64 holds
    the <2^31 codes exactly; int() restores identity with null-free
    int64 batches). The division is one IEEE double op — bit-identical
    across engines. This is the third kernel of the r08 slow-mode
    escape: at 10M docs the verify stage's interpreted
    collection-expression eval showed the same graded per-JVM CPU
    inflation (807 vs 364 CPU-s, identical plan)."""
    out_fields = [f for f in joined.schema.fields
                  if f.name not in (a_col, b_col)]
    out_schema = T.StructType(
        out_fields + [T.StructField("jaccard", T.DoubleType())])
    keep = [f.name for f in out_fields]

    def codes_set(a):
        if a is None:
            return None
        return {None if v is None or (isinstance(v, float) and v != v)
                else int(v) for v in a}

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            jac = []
            for ca, cb in zip(pdf[a_col], pdf[b_col]):
                sa, sb = codes_set(ca), codes_set(cb)
                if sa is None or sb is None:
                    jac.append(None)
                    continue
                u = len(sa | sb)
                jac.append(len(sa & sb) / u if u else None)
            out = pdf[keep].copy()
            out["jaccard"] = pd.Series(jac, index=pdf.index, dtype=object)
            yield out

    return joined.mapInPandas(gen, out_schema)


def sparse_postings_arrow(base: DataFrame, map_col: str, id_col: str,
                          key_col: str = "key",
                          weight_col: str = "weight") -> DataFrame:
    """Explode a SPARSE_FLOAT_VECTOR (MapType) column into inverted
    postings ``(id, key, weight)`` — the Arrow twin of
    ``search.sparse_postings`` (same output schema, same row set; NULL
    maps contribute no postings, exactly like ``F.explode``). The
    per-row dict iteration happens in Python over Arrow batches; the
    downstream bucket expression / partitioned write are unchanged."""
    mt = base.schema[map_col].dataType
    if not isinstance(mt, T.MapType):
        raise TypeError(f"{map_col} must be a MapType column, got {mt}")
    out_schema = T.StructType([
        T.StructField(id_col, base.schema[id_col].dataType),
        # map keys are never null — F.explode marks them non-nullable
        T.StructField(key_col, mt.keyType, False),
        # the map's declared value type/nullability, not a hardcoded
        # double: the JVM twin's F.explode preserves them, and a
        # map<int,float> input must emit float postings on both paths
        # (ADVICE r09)
        T.StructField(weight_col, mt.valueType, mt.valueContainsNull),
    ])

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            ids: list = []
            keys: list = []
            weights: list = []
            for i, m in zip(pdf[id_col], pdf[map_col]):
                if m is None:
                    continue
                items = m.items() if isinstance(m, dict) else m
                for k, w in items:
                    ids.append(i)
                    keys.append(k)
                    weights.append(w)
            yield pd.DataFrame(
                {id_col: ids, key_col: keys, weight_col: weights})

    return base.select(id_col, map_col).mapInPandas(gen, out_schema)
