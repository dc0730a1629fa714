from __future__ import annotations

import pytest

from resolve_overlap_and_gap_spark.operators.multimodal import (
    _decode_image_stub,
    extract_features,
    frame_sample,
    synthesize_media,
)


@pytest.mark.spark
def test_feature_extraction_plumbing(spark):
    media = synthesize_media(spark, 50, partitions=4)
    feats = extract_features(media, grid=4)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.feature) == 16
        assert 16 <= r.width <= 80 and 16 <= r.height <= 80
        assert r.channels == 3
        assert 0.0 <= r.mean_byte <= 255.0


@pytest.mark.spark
def test_frame_sample_shape(spark):
    media = synthesize_media(spark, 10, partitions=2)
    frames = frame_sample(media, every=8)
    per = frames.groupBy("media_id").count().collect()
    heights = {r.media_id: r.meta_h for r in media.select("media_id", "meta_h").collect()}
    for r in per:
        assert r["count"] == -(-heights[r.media_id] // 8)  # ceil


def test_decode_stub_rejects_real_formats():
    with pytest.raises(NotImplementedError):
        _decode_image_stub(b"\x89PNG\r\n\x1a\n" + b"0" * 100)


@pytest.mark.spark
def test_text_passthrough_byte_identity(spark):
    """BASELINE.md invariant: per-url extracted text stays byte-identical
    through the geo-parse + cell-assign pipeline."""
    from resolve_overlap_and_gap_spark.sources.pages import (
        synthesize_pages,
        with_point,
    )
    from resolve_overlap_and_gap_spark.operators.celljoin import points_with_cell

    pages = synthesize_pages(spark, 500, partitions=4)
    before = {r.url: r.text for r in pages.select("url", "text").collect()}
    out = points_with_cell(with_point(pages), res=8)
    after = {r.url: r.text for r in out.select("url", "text").collect()}
    assert before == after