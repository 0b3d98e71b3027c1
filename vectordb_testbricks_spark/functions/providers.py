"""Pluggable TEXT_EMBEDDING model providers (3.0-roadmap §6 "Function /
Model Provider" — reference feature-inventory doc; the reference defers
this to external services needing credentials, P2).

A provider is ONE batch featurizer function used on BOTH sides of the
seam: at write time it runs inside an Arrow-batched pandas UDF over the
raw input-text column (the external-model shape — real providers do
their own tokenization server-side), and at query time the SAME function
runs driver-side over the query texts. Query/document parity is
therefore by construction, the same discipline as the crc32-twinned
built-in hashing featurizer (functions/text.py:207-268).

The in-package ``hash_projection`` provider is a deterministic,
dependency-free stand-in with the exact call shape of an external
service (opaque text -> fixed-dim unit vector): signed-hashing-trick
projection to ``dim`` dimensions. A real provider (an HTTP embedding
endpoint, a local ONNX model) registers the same way — its batch_fn
makes the batched call; nothing else in the engine changes.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from typing import Callable

import pandas as pd

from pyspark.sql import Column


@dataclass(frozen=True)
class EmbeddingProvider:
    """A TEXT_EMBEDDING backend.

    ``batch_fn(texts, params) -> list`` featurizes a batch of raw texts
    (a list of ``str | None``) into embedding values (``list[float]``
    for dense, ``dict[int, float]`` for sparse, ``None`` propagated).
    ``output_type`` is the Spark SQL type of the function output field;
    ``metric`` picks the serving path in
    ``manager.text_embedding_search`` ("COSINE"/"IP"/"L2" -> dense V1
    knn, "SPARSE_DOT" -> the V6 sparse tier).
    """

    name: str
    batch_fn: Callable[[list, dict], list]
    output_type: str = "array<float>"
    metric: str = "COSINE"
    #: dense providers: the vector width emitted when ``params`` carries
    #: no ``dim`` override — lets SchemaSpec.validate() check the output
    #: field's declared dim at CREATE time (a dim-16 field silently
    #: storing 8-wide vectors was the r08 ADVICE finding). None = width
    #: not statically known (validation then only checks an explicit
    #: params["dim"]).
    default_dim: int | None = None


EMBEDDING_PROVIDERS: dict[str, EmbeddingProvider] = {}


def register_embedding_provider(provider: EmbeddingProvider) -> None:
    EMBEDDING_PROVIDERS[provider.name] = provider


def get_embedding_provider(name: str) -> EmbeddingProvider:
    try:
        return EMBEDDING_PROVIDERS[name]
    except KeyError:
        raise KeyError(
            f"unknown TEXT_EMBEDDING provider {name!r}; registered: "
            f"{sorted(EMBEDDING_PROVIDERS)}") from None


def provider_embed_column(provider: EmbeddingProvider, text_col: Column,
                          params: dict) -> Column:
    """Write-path column: the provider's batch featurizer as an
    Arrow-batched pandas UDF over the raw text column (never
    row-at-a-time — one Python call per Arrow batch)."""
    from pyspark.sql.functions import pandas_udf

    batch_fn, p = provider.batch_fn, dict(params)

    @pandas_udf(provider.output_type)
    def _embed(texts: pd.Series) -> pd.Series:
        return pd.Series(batch_fn(texts.tolist(), p))

    return _embed(text_col)


def provider_embed_query(provider: EmbeddingProvider, texts: list,
                         params: dict) -> list:
    """Query-path twin: the SAME batch featurizer, driver-side."""
    return provider.batch_fn(list(texts), dict(params))


def _hash_projection_batch(texts: list, params: dict) -> list:
    """Signed hashing-trick projection: each analyzed token adds ±1 to
    bucket crc32(token) % dim (sign from bit 16 of the same hash), then
    L2-normalize. Deterministic, order-insensitive, unit-norm — cosine
    of identical texts is exactly 1.0."""
    import math

    from vectordb_testbricks_spark.functions.text import py_tokenize
    dim = int(params.get("dim", 8))
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        v = [0.0] * dim
        for tok in py_tokenize(t):
            h = zlib.crc32(tok.encode("utf-8"))
            v[h % dim] += 1.0 if (h >> 16) & 1 == 0 else -1.0
        n = math.sqrt(sum(x * x for x in v))
        out.append([x / n for x in v] if n else v)
    return out


register_embedding_provider(EmbeddingProvider(
    name="hash_projection",
    batch_fn=_hash_projection_batch,
    output_type="array<float>",
    metric="COSINE",
    default_dim=8,
))
