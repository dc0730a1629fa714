"""Mixture downsampling (dedup.mixture_downsample): exact integer
quotas per source, deterministic hash keep-set, unknown sources kept
whole.
"""

from __future__ import annotations

import hashlib

import pytest

from resolve_overlap_and_gap_spark.operators.dedup import mixture_downsample


def _h32(doc_id: int, salt: str = "mix") -> int:
    return int(hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:8], 16)


@pytest.mark.spark
def test_quotas_and_keepset(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(90)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_downsample(docs, {"a": (1, 3), "b": (2, 3)}).collect()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    # 30 docs/source: a -> 10, b -> 20, c absent from weights -> all 30
    assert len(by_src["a"]) == 10
    assert len(by_src["b"]) == 20
    assert len(by_src["c"]) == 30
    # keep-set = lowest-hash docs per source (brute-force the rule)
    for src, keep in [("a", 10), ("b", 20)]:
        ids = [i for i, s in rows if s == src]
        want = set(sorted(ids, key=lambda i: (_h32(i), i))[:keep])
        assert by_src[src] == want


@pytest.mark.spark
def test_zero_and_full_weights(spark):
    docs = spark.createDataFrame(
        [(i, "x" if i < 7 else "y") for i in range(10)],
        "doc_id long, source string")
    out = mixture_downsample(docs, {"x": (0, 1), "y": (1, 1)}).collect()
    assert all(r.source == "y" for r in out)
    assert len(out) == 3
