"""Exact shared-substring span detection (dedup.shared_span_pairs):
planted verbatim runs are recovered with exact positions/lengths, and the
result equals a brute-force per-pair diagonal token scan on random docs.
"""

from __future__ import annotations

import numpy as np
import pytest

from resolve_overlap_and_gap_spark.operators import dedup


def _brute_spans(docs: dict[int, list[str]], k: int, min_tokens: int):
    """Maximal matching-token runs per (pair, diagonal); a run of L >= k
    tokens is one span row (start_a, start_b, L, L - k + 1)."""
    out = set()
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            da, db = ids[ai], ids[bi]
            A, B = docs[da], docs[db]
            for d in range(-(len(B) - 1), len(A)):
                i = max(0, d)
                j = i - d
                run = 0
                while i <= len(A) and j <= len(B):
                    hit = i < len(A) and j < len(B) and A[i] == B[j]
                    if hit:
                        run += 1
                    elif run:
                        if run >= max(k, min_tokens):
                            out.add((da, db, i - run + 1, j - run + 1,
                                     run, run - k + 1))
                        run = 0
                    i += 1
                    j += 1
    return out


def _docs_df(spark, docs: dict[int, list[str]]):
    return spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string")


@pytest.mark.spark
def test_planted_spans_exact(spark):
    rng = np.random.default_rng(11)
    vocab = [f"w{c:05d}" for c in range(5000)]

    def words(n):
        return [vocab[i] for i in rng.integers(0, len(vocab), n)]

    shared20 = words(20)
    shared13 = words(13)
    shared8 = words(8)  # below min_tokens=12 -> must NOT appear
    docs = {
        1: words(30) + shared20 + words(10),          # span at pos 31
        2: words(5) + shared20 + words(40),           # span at pos 6
        3: words(50),                                 # no overlap
        4: words(12) + shared13 + words(9) + shared8,
        5: shared13 + words(20) + shared8 + words(7),
    }
    got = {tuple(r) for r in dedup.shared_span_pairs(
        _docs_df(spark, docs), k=6, min_tokens=12, max_df=None).collect()}
    assert (1, 2, 31, 6, 20, 15) in got
    assert (4, 5, 13, 1, 13, 8) in got
    assert not any(r[4] == 8 for r in got)  # 8-token run filtered
    assert got == _brute_spans({i: [w.lower() for w in t]
                                for i, t in docs.items()}, 6, 12)


@pytest.mark.spark
def test_random_docs_match_bruteforce(spark):
    rng = np.random.default_rng(7)
    vocab = [f"t{c:03d}" for c in range(40)]  # tiny vocab -> chance runs
    docs = {i: [vocab[j] for j in rng.integers(0, len(vocab), 60)]
            for i in range(8)}
    # plant one cross-pair duplicate to guarantee at least one long span
    docs[6][10:25] = docs[2][30:45]
    got = {tuple(r) for r in dedup.shared_span_pairs(
        _docs_df(spark, docs), k=3, min_tokens=5, max_df=None).collect()}
    want = _brute_spans(docs, 3, 5)
    assert got == want
    assert any(r[0] == 2 and r[1] == 6 and r[4] >= 15 for r in got)


@pytest.mark.spark
def test_hot_gram_cap_splits_span(spark):
    """A gram over the occurrence cap is dropped corpus-wide; a span
    crossing it splits (documented stop-gram semantics)."""
    boiler = [f"b{c}" for c in range(3)]  # 3-token boilerplate gram
    left, right = [f"l{c}" for c in range(6)], [f"r{c}" for c in range(6)]
    # boilerplate appears in every doc -> its grams exceed max_df=3
    docs = {i: [f"u{i}_{c}" for c in range(4)] + boiler
            for i in range(1, 5)}
    docs[1] = left + boiler + right
    docs[2] = left + boiler + right
    uncapped = {tuple(r) for r in dedup.shared_span_pairs(
        _docs_df(spark, docs), k=3, min_tokens=4, max_df=None).collect()}
    assert (1, 2, 1, 1, 15, 13) in uncapped
    capped = {tuple(r) for r in dedup.shared_span_pairs(
        _docs_df(spark, docs), k=3, min_tokens=4, max_df=3).collect()}
    # the 15-token identical pair splits into two runs around the dropped
    # boilerplate grams (exact split points depend on which grams ANY doc
    # shares; assert the maximal row is gone but both sides survive)
    assert not any(r[4] == 15 for r in capped)
    assert any(r[0] == 1 and r[1] == 2 and r[2] == 1 for r in capped)
    assert any(r[0] == 1 and r[1] == 2 and r[2] > 6 for r in capped)
