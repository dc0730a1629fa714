"""r6 robustness pin (ADVICE item): image_dhash must survive images
smaller than the pooling grid (1x1 tracking pixels are common in crawls)
with np.array_split semantics — empty cells sum 0 / count 0, bit False."""

from __future__ import annotations

import numpy as np
import pytest

from resolve_overlap_and_gap_spark.operators.multimodal import encode_png


@pytest.mark.spark
def test_dhash_tiny_images(spark):
    from resolve_overlap_and_gap_spark.operators.multimodal import image_dhash

    rng = np.random.default_rng(7)
    rows = []
    for mid, (h, w) in enumerate([(1, 1), (1, 5), (3, 4), (16, 18), (2, 2)]):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        rows.append((mid, bytearray(encode_png(img))))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = image_dhash(media).collect()
    assert len(out) == 5
    by_id = {r.media_id: r for r in out}
    # a 1x1 image has no brighter-right pair anywhere: hash must be 0
    assert by_id[0].dhash_hi == 0 and by_id[0].dhash_lo == 0
    assert by_id[0].width == 1 and by_id[0].height == 1
