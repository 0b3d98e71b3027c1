"""Multimodal (image/audio/video) column pipeline.

Large-scale training-data pipelines carry media as opaque ``binary`` columns
with typed metadata alongside (the reference moves media-adjacent payloads the
same way: parquet bulk files with schema-declared columns,
``milvus_client/query_iterator.py:225-260``, ``tpuffer/parquet_to_json.py``).

Design (the Spark-side plumbing is real; only the codec is faked):

* media rows = ``(id, modality, payload binary, meta struct)``;
* decode / feature-extract / resize / frame-sample run as **Arrow-batched
  ``mapInPandas``** stages — one Python worker per partition, zero-copy
  batches, never per-row UDF calls;
* the actual image/audio codec libraries are not in this container, so
  ``decode_media`` computes a **deterministic fake decode** derived from the
  payload bytes (documented below, reproducible in SQL for the oracle) and
  the real-codec hook raises ``NotImplementedError`` behind
  ``require_real_codecs()``.

At 100 TB the unit of work is the Arrow batch: payloads stay in the executor,
metadata-only plans never touch the binary column (column pruning — callers
should select the payload column only in the decode stage).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# optional real-codec backend: PIL for images, detected at import. The
# fake decode stays the default (and the only oracle-checkable path); the
# real backend activates wherever the deployment image ships Pillow.
try:
    from PIL import Image as _PILImage  # noqa: N813
except ImportError:  # container has no codec libs — fake decode only
    _PILImage = None

REAL_CODECS_AVAILABLE = _PILImage is not None


def require_real_codecs() -> None:
    """Gate for the real decode path: no-op when Pillow importable, raises
    otherwise (deployments without codec libs fail loudly, not wrongly)."""
    if not REAL_CODECS_AVAILABLE:
        raise NotImplementedError(
            "real media codecs (PIL/libav) are not installed in this "
            "container; use the deterministic fake decode "
            "(decode_media backend='fake') instead")


def media_from_documents(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Synthesize a media table from the documents fixture: the UTF-8 text
    bytes stand in for an encoded payload. Columns:
    (media_id, modality, payload binary, n_bytes).

    modality cycles image/audio/video by id — deterministic, oracle-friendly.
    """
    modality = (F.when(F.col(id_col) % 3 == 0, "image")
                .when(F.col(id_col) % 3 == 1, "audio")
                .otherwise("video"))
    return docs.select(
        F.col(id_col).alias("media_id"),
        modality.alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
    )


# ---------------------------------------------------------------- fake codec

def _fake_decode(payload: bytes, modality: str) -> dict:
    """Deterministic fake decode. Derivation is pure bytes → metadata:

    * ``digest`` = md5 hex of the payload (content address);
    * ``width``  = 64 + (first 8 digest hex chars as int) % 1920  (image/video)
    * ``height`` = 64 + (next 8 hex chars as int) % 1080
    * ``duration_ms`` = (n_bytes * 10)                            (audio/video)
    * ``n_frames`` = 1 + digest-derived % 240                     (video)

    Every field is reproducible in DuckDB from md5()/octet_length() — the
    oracle in __spark_entry__ recomputes them in SQL.
    """
    digest = hashlib.md5(payload).hexdigest()
    width = 64 + int(digest[:8], 16) % 1920
    height = 64 + int(digest[8:16], 16) % 1080
    n_frames = 1 + int(digest[16:24], 16) % 240
    return {
        "digest": digest,
        "width": width if modality in ("image", "video") else None,
        "height": height if modality in ("image", "video") else None,
        "duration_ms": len(payload) * 10 if modality in ("audio", "video") else None,
        "n_frames": n_frames if modality == "video" else None,
    }


DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("modality", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("digest", T.StringType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("n_frames", T.LongType()),
])


def _pil_decode(payload: bytes, modality: str) -> dict:
    """Real image decode via Pillow (``require_real_codecs`` gated).
    Width/height come from the actual pixel buffer; animated containers
    (GIF/APNG) report their frame count as a video would. Non-image
    modalities fall back to the fake derivation — audio/video codecs are
    a further backend."""
    import io
    digest = hashlib.md5(payload).hexdigest()
    if modality not in ("image", "video"):
        return _fake_decode(payload, modality)
    with _PILImage.open(io.BytesIO(payload)) as img:
        n_frames = getattr(img, "n_frames", 1)
        return {
            "digest": digest,
            "width": img.width,
            "height": img.height,
            "duration_ms": None,
            "n_frames": n_frames if modality == "video" else None,
        }


# ------------------------------------------------------- stdlib PNG codec

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type → samples/px


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Minimal stdlib PNG decode: parse chunks, inflate IDAT, invert the
    per-scanline filters (None/Sub/Up/Average/Paeth — PNG spec / RFC 2083
    §6). Handles 8-bit-depth, non-interlaced images of every color type.
    Returns ``(width, height, pixels)`` where ``pixels`` is ``height``
    unfiltered scanlines of ``width × channels`` bytes.

    This is a *real* decoder (dependency-free), so the real-codec branch
    of the media pipeline executes in every environment — Pillow remains
    an optional richer backend for other formats."""
    import struct
    import zlib
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload (bad signature)")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or interlace:
                raise ValueError(
                    "png backend handles 8-bit non-interlaced PNGs only")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"invalid PNG color type {color}")
            meta = (w, h, _PNG_CHANNELS[color])
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, ch = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data does not match declared dims")
    out = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        line = bytearray(raw[off + 1:off + 1 + stride])
        if f == 1:                                 # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:                               # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:                               # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif f == 4:                               # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter type {f}")
        out += line
        prev = line
    return w, h, bytes(out)


def _png_decode(payload: bytes, modality: str) -> dict:
    """Real image decode via the stdlib PNG decoder (always available).
    Non-image modalities fall back to the fake derivation, same as the
    Pillow backend."""
    if modality not in ("image", "video"):
        return _fake_decode(payload, modality)
    w, h, _pixels = decode_png(payload)
    return {
        "digest": hashlib.md5(payload).hexdigest(),
        "width": w,
        "height": h,
        "duration_ms": None,
        "n_frames": 1 if modality == "video" else None,
    }


_DECODE_BACKENDS = {"fake": _fake_decode, "pil": _pil_decode,
                    "png": _png_decode}


def decode_media(media: DataFrame, backend: str = "fake") -> DataFrame:
    """Decode stage: payload binary → typed metadata via ``mapInPandas``.

    ``backend='fake'`` (default) derives metadata deterministically from
    the payload bytes — the oracle-checkable path. ``backend='png'`` is a
    real, dependency-free PNG decoder (stdlib zlib + filter inversion) —
    the real-codec branch that runs everywhere. ``backend='pil'`` decodes
    arbitrary image formats with Pillow (raises NotImplementedError when
    the library is absent). All run in the same Arrow-batched plan shape.

    The payload column is dropped on output — downstream stages are
    metadata-only and must not re-shuffle gigabytes of media bytes.
    """
    if backend not in _DECODE_BACKENDS:
        raise ValueError(f"unknown decode backend {backend!r}")
    if backend == "pil":
        require_real_codecs()
    decode = _DECODE_BACKENDS[backend]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, mod, payload in zip(pdf["media_id"], pdf["modality"],
                                         pdf["payload"]):
                d = decode(bytes(payload), mod)
                rows.append((mid, mod, len(bytes(payload)), d["digest"],
                             d["width"], d["height"], d["duration_ms"],
                             d["n_frames"]))
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA])

    cols = media.select("media_id", "modality", "payload")
    return cols.mapInPandas(batches, DECODED_SCHEMA)


def resize_plan(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stage (images/video): compute target dims preserving aspect
    ratio — pure column math, JVM-side; the pixel work would live in the
    (stubbed) codec. Returns rows with (target_w, target_h, scale)."""
    w, h = F.col("width"), F.col("height")
    longest = F.greatest(w, h)
    scale = F.when(longest > max_side,
                   F.lit(max_side) / longest.cast("double")).otherwise(F.lit(1.0))
    return (decoded.filter(F.col("width").isNotNull())
            .withColumn("scale", scale)
            .withColumn("target_w", F.floor(w * F.col("scale")).cast("bigint"))
            .withColumn("target_h", F.floor(h * F.col("scale")).cast("bigint")))


def frame_sample_plan(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stage (video): explode sampled frame indices
    (0, every_n, 2·every_n, …) per clip — `sequence` + `explode`, JVM-side.
    Output: one row per (media_id, frame_idx)."""
    vids = decoded.filter(F.col("modality") == "video")
    idxs = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return (vids.withColumn("frame_idx", F.explode(idxs))
            .select("media_id", "n_frames", "frame_idx"))


FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.DoubleType())),
])


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature-extract stage: payload → fixed-dim float vector via
    ``mapInPandas`` (the embedding-model hook). Fake featurizer: bytes of the
    md5 digest scaled to [0, 1) — deterministic, shape-correct Arrow batches
    (what a real vision/audio encoder would emit)."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                digest = hashlib.md5(bytes(payload)).digest()
                vec = [digest[i % 16] / 256.0 for i in range(dim)]
                out.append((mid, vec))
            yield pd.DataFrame(out, columns=["media_id", "feature"])

    return media.select("media_id", "payload").mapInPandas(
        batches, FEATURE_SCHEMA)


def modality_stats(decoded: DataFrame) -> DataFrame:
    """Per-modality corpus stats over decoded metadata (no payload touched)."""
    return (decoded.groupBy("modality")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum("n_bytes").alias("total_bytes"),
                 F.avg(F.col("width").cast("double")).alias("avg_width"),
                 F.sum("duration_ms").alias("total_duration_ms"))
            .orderBy("modality"))
