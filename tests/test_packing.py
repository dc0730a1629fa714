"""Token-budget sequence packing (operators/packing.py): equals the
greedy brute force, respects the capacity invariant, numbers sequences
densely per shard in doc order.
"""

from __future__ import annotations

import numpy as np
import pytest

from resolve_overlap_and_gap_spark.operators.packing import pack_sequences


def _brute(pairs, capacity, n_shards):
    """pairs: [(doc_id, n_tokens)] -> {(doc_id): (shard, seq_idx)}."""
    out = {}
    for s in range(n_shards):
        seq, fill = 0, 0
        for did, t in sorted(p for p in pairs if p[0] % n_shards == s):
            if fill and fill + t > capacity:
                seq += 1
                fill = 0
            fill += t
            out[did] = (s, seq)
    return out


@pytest.mark.spark
def test_pack_matches_bruteforce(spark):
    rng = np.random.default_rng(3)
    rows = [(int(i), " ".join("w" for _ in range(int(n))))
            for i, n in enumerate(rng.integers(1, 300, 200))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.shard, r.seq_idx, r.n_tokens)
           for r in pack_sequences(docs, capacity=256, n_shards=4).collect()}
    want = _brute([(i, t.count(" ") + 1) for i, t in rows], 256, 4)
    assert len(got) == len(rows)
    for did, (s, q) in want.items():
        assert got[did][:2] == (s, q), did


@pytest.mark.spark
def test_capacity_invariant_and_oversize(spark):
    rows = [(1, " ".join("w" for _ in range(700))),   # oversize: own seq
            (9, "a b c"), (17, " ".join("w" for _ in range(500))),
            (25, "x y")]                               # all shard 1 (mod 8)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(docs, capacity=512, n_shards=8).collect()
    by_seq: dict = {}
    for r in out:
        assert r.shard == 1
        by_seq.setdefault(r.seq_idx, []).append(r)
    # doc 1 (700 > 512) alone in seq 0; 9 opens seq 1; 17 (3+500 <= 512)
    # joins it; 25 fits too (505 + 2 <= 512)
    assert [r.doc_id for r in by_seq[0]] == [1]
    assert sorted(r.doc_id for r in by_seq[1]) == [9, 17, 25]
    for q, rs in by_seq.items():
        tot = sum(r.n_tokens for r in rs)
        assert tot <= 512 or len(rs) == 1
