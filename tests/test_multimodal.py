"""Multimodal pipeline plumbing: schema, batch shape, stub gating."""

from __future__ import annotations

import base64
import hashlib

import pytest

from pyspark.sql import functions as F

from vectordb_testbricks_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark, tables):
    return MM.media_from_documents(tables["documents"].df).cache()


# a valid 1×1 PNG (golden file for the optional Pillow backend)
_PNG_1PX = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
    "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")


def test_real_codec_gate_matches_availability():
    """require_real_codecs() is a no-op iff Pillow imports; without it the
    gate raises (deployments fail loudly, never silently fake-decode when
    the caller asked for real)."""
    if MM.REAL_CODECS_AVAILABLE:
        MM.require_real_codecs()  # must not raise
    else:
        with pytest.raises(NotImplementedError):
            MM.require_real_codecs()


def test_decode_backend_validation(media):
    with pytest.raises(ValueError, match="unknown decode backend"):
        MM.decode_media(media, backend="ffmpeg")
    if not MM.REAL_CODECS_AVAILABLE:
        with pytest.raises(NotImplementedError):
            MM.decode_media(media, backend="pil")


def test_pil_backend_golden_or_gate(spark):
    """Where Pillow ships, the pil backend decodes the golden 1×1 PNG to
    its true pixel dimensions; where it doesn't, asking for it raises the
    gate error. Either way the test executes — no permanent skip."""
    m = spark.createDataFrame(
        [(1, "image", bytearray(_PNG_1PX))],
        "media_id long, modality string, payload binary")
    if MM.REAL_CODECS_AVAILABLE:
        row = MM.decode_media(m, backend="pil").collect()[0]
        assert (row["width"], row["height"]) == (1, 1)
        assert row["digest"] == hashlib.md5(_PNG_1PX).hexdigest()
    else:
        with pytest.raises(NotImplementedError):
            MM.decode_media(m, backend="pil")


def test_png_backend_decodes_golden_png(spark):
    """The dependency-free real-codec path: the stdlib PNG backend decodes
    the golden 1×1 PNG to its true pixel dimensions inside the same
    Arrow-batched decode plan — runs in every environment."""
    m = spark.createDataFrame(
        [(1, "image", bytearray(_PNG_1PX)),
         (2, "audio", bytearray(b"not a png; audio falls back to fake"))],
        "media_id long, modality string, payload binary")
    rows = {r["media_id"]: r
            for r in MM.decode_media(m, backend="png").collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (1, 1)
    assert rows[1]["digest"] == hashlib.md5(_PNG_1PX).hexdigest()
    # non-image modality: fake derivation, same as the pil backend
    assert rows[2]["duration_ms"] == rows[2]["n_bytes"] * 10


def _filter_scanline(ftype: int, line: bytes, prev: bytes, ch: int) -> bytes:
    """Forward PNG filter (the encoder side, implemented independently in
    the test so the decoder's inversion is checked against the spec, not
    against itself)."""
    out = bytearray([ftype])
    for i, x in enumerate(line):
        a = line[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        if ftype == 0:
            out.append(x)
        elif ftype == 1:
            out.append((x - a) & 0xFF)
        elif ftype == 2:
            out.append((x - b) & 0xFF)
        elif ftype == 3:
            out.append((x - (a + b) // 2) & 0xFF)
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((x - pred) & 0xFF)
    return bytes(out)


def test_decode_png_inverts_all_filter_types():
    """Round-trip: forward-filter a known 4×5 RGB pixel buffer with every
    filter type (one per scanline: None/Sub/Up/Average/Paeth), wrap it in
    a valid PNG, and assert decode_png recovers the exact pixels."""
    import struct
    import zlib
    w, h, ch = 4, 5, 3
    stride = w * ch
    pixels = bytes((y * 37 + i * 11) % 256
                   for y in range(h) for i in range(stride))
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = pixels[y * stride:(y + 1) * stride]
        raw += _filter_scanline(y % 5, line, prev, ch)
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    png = (MM.PNG_SIGNATURE
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    dw, dh, dpix = MM.decode_png(png)
    assert (dw, dh) == (w, h)
    assert dpix == pixels


def test_decode_png_rejects_non_png():
    with pytest.raises(ValueError, match="bad signature"):
        MM.decode_png(b"GIF89a not a png")


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "modality", "payload", "n_bytes"]
    assert dict(media.dtypes)["payload"] == "binary"
    mods = {r["modality"] for r in media.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}


def test_decode_matches_reference_hash(media):
    row = (MM.decode_media(media).filter(F.col("media_id") == 0)
           .collect()[0])
    payload = media.filter(F.col("media_id") == 0).collect()[0]["payload"]
    digest = hashlib.md5(bytes(payload)).hexdigest()
    assert row["digest"] == digest
    assert row["modality"] == "image"
    assert row["width"] == 64 + int(digest[:8], 16) % 1920
    assert row["duration_ms"] is None  # images have no duration


def test_decode_drops_payload(media):
    decoded = MM.decode_media(media)
    assert "payload" not in decoded.columns


def test_resize_bounds(media):
    plan = MM.resize_plan(MM.decode_media(media), max_side=256)
    bad = plan.filter((F.greatest("target_w", "target_h") > 256)
                      | (F.col("target_w") < 1) | (F.col("target_h") < 1))
    assert bad.count() == 0


def test_frame_sample_counts(media):
    frames = MM.frame_sample_plan(MM.decode_media(media), every_n=10)
    per = (frames.groupBy("media_id", "n_frames")
           .agg(F.count(F.lit(1)).alias("n")).collect())
    assert per, "expected at least one video"
    for r in per:
        expected = (r["n_frames"] + 9) // 10  # ceil(n_frames / 10)
        assert r["n"] == expected


def test_feature_shape(media):
    feats = MM.extract_features(media, dim=8).collect()
    assert all(len(r["feature"]) == 8 for r in feats)
    assert all(0.0 <= x < 1.0 for r in feats for x in r["feature"])


def test_decode_png_roundtrip_property():
    """Property: any 8-bit pixel buffer, any per-row filter choice, any
    color type survives encode(forward filters) → decode_png exactly."""
    import struct
    import zlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def roundtrip(data):
        w = data.draw(st.integers(1, 6))
        h = data.draw(st.integers(1, 6))
        color, ch = data.draw(st.sampled_from(
            [(0, 1), (2, 3), (4, 2), (6, 4)]))
        stride = w * ch
        pixels = bytes(data.draw(st.lists(
            st.integers(0, 255), min_size=h * stride, max_size=h * stride)))
        filters = data.draw(st.lists(
            st.integers(0, 4), min_size=h, max_size=h))
        raw = bytearray()
        prev = bytes(stride)
        for y in range(h):
            line = pixels[y * stride:(y + 1) * stride]
            raw += _filter_scanline(filters[y], line, prev, ch)
            prev = line
        png = (MM.PNG_SIGNATURE
               + chunk(b"IHDR",
                       struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
        dw, dh, dpix = MM.decode_png(png)
        assert (dw, dh, dpix) == (w, h, pixels)
    roundtrip()
