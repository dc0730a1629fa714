"""Sketch operators: KMV distinct, Bloom membership, Count-Min — and the
C4-style line-level dedup.  Each test pins semantics against a planted
brute-force computation (the DuckDB-parity check lives in the oracle
registry; these pin the operator API itself)."""

from __future__ import annotations

import hashlib

import pytest

from resolve_overlap_and_gap_spark.operators import dedup, sketch


def _h32(value: str, salt: str) -> int:
    return int(hashlib.md5((value + salt).encode()).hexdigest()[:8], 16)


# ----------------------------------------------------------------- KMV
def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(i % 7, f"v{i % 30}") for i in range(200)],
                               "g int, v string")
    out = {r.grp: (r.n_seen, r.kmv_est)
           for r in sketch.kmv_distinct(df, "v", k=64, group_col="g").collect()}
    # fewer than k distinct values -> the sketch IS the exact count
    for g in range(7):
        true = len({f"v{i % 30}" for i in range(200) if i % 7 == g})
        assert out[g] == (true, true)


def test_kmv_estimates_above_k(spark):
    n = 5000
    df = spark.createDataFrame([(f"v{i}",) for i in range(n)], "v string")
    (row,) = sketch.kmv_distinct(df, "v", k=64).collect()
    assert row.n_seen == 64
    # brute-force the estimator from the same md5 hashes
    hs = sorted(_h32(f"v{i}", ":kmv") for i in range(n))[:64]
    expect = int(63 * sketch.TWO32 / hs[-1])
    assert row.kmv_est == expect
    assert abs(row.kmv_est - n) / n < 0.5  # 1/sqrt(64) band, generous


# --------------------------------------------------------------- Bloom
def test_bloom_no_false_negatives_and_exact_fp_set(spark):
    ins = spark.createDataFrame([(i, f"k{i}") for i in range(0, 300, 2)],
                                "id long, key string")
    probe = spark.createDataFrame([(i, f"k{i}") for i in range(300)],
                                  "id long, key string")
    out = {r.probe_id: r.might_contain
           for r in sketch.bloom_membership(
               ins, probe, "key", "key", "id", m=512, k=4).collect()}
    # brute-force the lit-position set
    lit = {_h32(f"k{i}", f":bloom{j}") % 512
           for i in range(0, 300, 2) for j in range(4)}
    for i in range(300):
        expect = all(_h32(f"k{i}", f":bloom{j}") % 512 in lit
                     for j in range(4))
        assert out[i] == expect, i
        if i % 2 == 0:
            assert out[i] is True  # no false negatives, ever
    # the parameters above are chosen to produce at least one collision
    assert any(out[i] for i in range(1, 300, 2))


# ------------------------------------------------------------ Count-Min
def test_cms_overestimates_only_and_exact(spark):
    rows = [(f"t{i % 9}",) for i in range(90)] + [("hot",)] * 60
    df = spark.createDataFrame(rows, "v string")
    probes = df.select("v").distinct()
    out = {r.term: r.cms_est
           for r in sketch.cms_freq(df, "v", probes, "v", w=8, d=3).collect()}
    import collections
    true = collections.Counter(v for (v,) in rows)
    cells: dict[tuple[int, int], int] = collections.Counter()
    for v, c in true.items():
        for j in range(3):
            cells[(j, _h32(v, f":cm{j}") % 8)] += c
    for v, c in true.items():
        expect = min(cells[(j, _h32(v, f":cm{j}") % 8)] for j in range(3))
        assert out[v] == expect
        assert out[v] >= c  # CMS never undercounts


# ------------------------------------------------------- line dedup
@pytest.fixture()
def line_docs(spark):
    # doc 1 and doc 3 share their first line; doc 2 repeats a line
    # internally; tokens_per_line=2
    return spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "x y x y z z"),
            (3, "a b e f"),
        ],
        "doc_id long, text string",
    )


def test_line_dedup_first_wins(spark, line_docs):
    out = {r.doc_id: r for r in
           dedup.line_dedup_docs(line_docs, tokens_per_line=2).collect()}
    assert (out[1].n_lines, out[1].n_kept) == (2, 2)
    assert out[1].clean_text == "a b c d"
    # doc 2: "x y" kept once (internal repeat dropped), "z z" kept
    assert (out[2].n_lines, out[2].n_kept) == (3, 2)
    assert out[2].clean_text == "x y z z"
    # doc 3 loses "a b" to doc 1 (global first-wins), keeps "e f"
    assert (out[3].n_lines, out[3].n_kept) == (2, 1)
    assert out[3].clean_text == "e f"


def test_line_dedup_fully_duplicate_doc(spark):
    docs = spark.createDataFrame(
        [(1, "p q r s"), (2, "p q r s")], "doc_id long, text string")
    out = {r.doc_id: r for r in
           dedup.line_dedup_docs(docs, tokens_per_line=2).collect()}
    assert out[1].clean_text == "p q r s"
    assert out[2].n_kept == 0
    assert out[2].clean_text == ""


def test_line_dedup_normalizes_before_compare(spark):
    docs = spark.createDataFrame(
        [(1, "A  B"), (2, "a b")], "doc_id long, text string")
    out = {r.doc_id: r for r in
           dedup.line_dedup_docs(docs, tokens_per_line=2).collect()}
    assert out[1].n_kept == 1 and out[2].n_kept == 0


# ------------------------------------------------------ exact quantiles
def test_exact_quantiles_rank_rule_and_ties(spark):
    # values with heavy ties; type-1 rule: value at rank ceil(q*n)
    vals = [1] * 5 + [2] * 3 + [10] * 2   # n=10
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = {r.q: r.qval
           for r in sketch.exact_quantiles(df, "v", [0.1, 0.5, 0.8, 0.81, 1.0]).collect()}
    assert out == {0.1: 1, 0.5: 1, 0.8: 2, 0.81: 10, 1.0: 10}


def test_exact_quantiles_single_row_groups(spark):
    df = spark.createDataFrame([("a", 7), ("b", 9)], "g string, v long")
    out = {(r.grp, r.q): r.qval
           for r in sketch.exact_quantiles(df, "v", [0.5], group_col="g").collect()}
    assert out == {("a", 0.5): 7, ("b", 0.5): 9}
