"""Distributed BPE tokenizer training (textstats.bpe_train) vs an
independent in-memory reference trainer — exact merge-table equality.

The reference below is written in the classic dict-counting style
(Sennrich et al. 2016 pseudocode) with the same deterministic tie rule
(count desc, left asc, right asc), sharing no code with the Spark
operator, so agreement pins the distributed formulation: pair counting
weighted by word frequency, greedy left-to-right merge application, and
argmax selection.
"""

import collections

import pytest

from resolve_overlap_and_gap_spark.operators.textstats import bpe_train


def _ref_bpe(word_freqs: dict, n_merges: int):
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(n_merges):
        counts = collections.Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, left, right, cnt))
        new = {}
        for syms, f in vocab.items():
            res = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new[tuple(res)] = new.get(tuple(res), 0) + f
        vocab = new
    return merges


@pytest.mark.parametrize("n_merges", [5, 12])
@pytest.mark.parametrize("cap", [200_000, 0])
def test_bpe_train_matches_reference(spark, n_merges, cap):
    """cap=200k takes the collect-the-type-table driver path; cap=0
    forces the distributed per-round loop — identical merge tables."""
    texts = [
        "low low low low low",
        "lower lower newest newest newest",
        "newest newest newest widest widest",
        "low lower newest widest wide wide",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    got = [tuple(r) for r in
           bpe_train(docs, n_merges=n_merges, driver_vocab_cap=cap)
           .orderBy("rank").collect()]

    freqs: dict = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    want = _ref_bpe(freqs, n_merges)
    assert got == want
    # sanity: the famous toy corpus learns real subwords
    learned = {m[1] + m[2] for m in got}
    assert any(tok in learned for tok in ("lo", "low", "est", "ne", "wi"))


def test_bpe_train_deterministic_ties(spark):
    """Equal-count pairs resolve by (left, right) lexicographic order —
    engine-order-independent."""
    docs = spark.createDataFrame([(0, "ab cd ab cd")],
                                 "doc_id long, text string")
    got = [tuple(r) for r in
           bpe_train(docs, n_merges=2).orderBy("rank").collect()]
    # 'ab' and 'cd' both appear twice: 'a'+'b' wins rank 0 lexicographically
    assert got[0][1:] == ("a", "b", 2)
    assert got[1][1:] == ("c", "d", 2)


def test_bpe_train_paths_agree_on_non_bmp(spark):
    """Words with non-BMP characters (emoji) must split into CODE POINTS
    on both paths — Spark SQL split() would halve surrogate pairs, so the
    distributed path does its symbol split in Python (Arrow-batched)."""
    word = "a\N{GRINNING FACE}b"
    docs = spark.createDataFrame(
        [(0, f"{word} {word} {word} xy xy")], "doc_id long, text string")
    local = [tuple(r) for r in
             bpe_train(docs, n_merges=3).orderBy("rank").collect()]
    dist = [tuple(r) for r in
            bpe_train(docs, n_merges=3, driver_vocab_cap=0)
            .orderBy("rank").collect()]
    assert local == dist
    # the emoji stays one symbol: the first merge joins 'a' + the emoji
    # (or the emoji + 'b'), never a lone surrogate half
    for _rank, left, right, _cnt in local:
        for sym in (left, right):
            for ch in sym:
                assert not 0xD800 <= ord(ch) <= 0xDFFF
