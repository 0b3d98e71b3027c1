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


@pytest.mark.skipif(not MM.REAL_CODECS_AVAILABLE,
                    reason="Pillow not installed in this container")
def test_pil_backend_decodes_golden_png(spark):
    """Optional real-codec path: a genuine 1×1 PNG decodes to its true
    pixel dimensions (not the hash-derived fake ones)."""
    m = spark.createDataFrame(
        [(1, "image", bytearray(_PNG_1PX))],
        "media_id long, modality string, payload binary")
    row = MM.decode_media(m, backend="pil").collect()[0]
    assert (row["width"], row["height"]) == (1, 1)
    assert row["digest"] == hashlib.md5(_PNG_1PX).hexdigest()


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
