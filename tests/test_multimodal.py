"""Multimodal plumbing: schema, mapInPandas batch shape, frame fan-out.
Decode itself is stubbed (no codec libs in this container) — the Spark-side
topology is what's under test."""

from kr_spark.operators.multimodal import (
    extract_image_features,
    metadata_only_scan,
    sample_video_frames,
    synthesize_media,
)


def test_media_synthesis_schema(spark):
    m = synthesize_media(spark, n=30)
    assert m.count() == 30
    row = m.filter("kind = 'image'").first()
    assert isinstance(row.payload, (bytes, bytearray)) and len(row.payload) > 0


def test_image_feature_extraction_batches(spark):
    m = synthesize_media(spark, n=30)
    feats = extract_image_features(m)
    rows = feats.collect()
    assert len(rows) == m.filter("kind = 'image'").count()
    assert all(len(r.feature) == 8 for r in rows)
    assert all(0.0 <= r.mean_luma <= 1.0 for r in rows)


def test_video_frame_sampling_fanout(spark):
    m = synthesize_media(spark, n=30)
    frames = sample_video_frames(m, every_ms=5000)
    vids = m.filter("kind = 'video'").select("media_id", "duration_ms").collect()
    expected = sum(v.duration_ms // 5000 + 1 for v in vids)
    assert frames.count() == expected


def test_metadata_scan_prunes_payload(spark):
    m = synthesize_media(spark, n=10)
    meta = metadata_only_scan(m)
    assert "payload" not in meta.columns
    meta.collect()
