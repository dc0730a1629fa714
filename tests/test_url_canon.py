"""URL canonicalization edge cases (the crawl dedup key): each rule pinned
on hand-built URLs through the Spark-dialect formula, plus Spark==DuckDB
agreement on the same rows (the no-backref construction is the part that
could silently diverge between regexp dialects)."""

from __future__ import annotations

import duckdb
import pytest

from resolve_overlap_and_gap_spark.derive import DUCKDB, SPARK
from resolve_overlap_and_gap_spark.operators.textstats import (
    canonical_url_sql,
    url_host_sql,
)

CASES = [
    ("HTTP://WWW.Example.COM:80/a/b", "http://example.com/a/b"),
    ("https://Site.org:443/", "https://site.org/"),
    ("https://site.org:8443/x", "https://site.org:8443/x"),  # non-default port kept
    ("http://a.com/p/?utm_source=x&id=3#frag", "http://a.com/p?id=3"),
    ("http://a.com/p?id=3&utm_medium=m", "http://a.com/p?id=3"),
    ("http://a.com/p?utm_a=1&utm_b=2&q=z", "http://a.com/p?q=z"),
    ("http://a.com/p?utm_only=1", "http://a.com/p"),
    ("http://a.com/dir/", "http://a.com/dir"),
    ("http://a.com/", "http://a.com/"),                       # root slash kept
    ("ftp://Host.Net/File", "ftp://host.net/File"),           # path case kept
    # path/query split: '&utm_' in a PATH segment and '/?' inside a query
    # value are data, not tracking params — must pass through untouched
    ("http://a.com/p&utm_x/q", "http://a.com/p&utm_x/q"),
    ("http://a.com/p?next=/?x", "http://a.com/p?next=/?x"),
    ("http://a.com/?id=3", "http://a.com/?id=3"),             # root + query
]


@pytest.mark.spark
def test_canonical_rules_spark(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    out = df.selectExpr(f"{canonical_url_sql('url', SPARK)} as c",
                        "url").collect()
    got = {r.url: r.c for r in out}
    for u, want in CASES:
        assert got[u] == want, (u, got[u], want)


def test_canonical_rules_duckdb_matches():
    con = duckdb.connect()
    expr = canonical_url_sql("url", DUCKDB)
    host = url_host_sql(f"({expr})", DUCKDB)
    for u, want in CASES:
        c, h = con.execute(
            f"select {expr}, {host} from (select ? as url)", [u]
        ).fetchone()
        assert c == want, (u, c, want)
        assert "://" not in h and "/" not in h


@pytest.mark.spark
def test_blocklist_suffix_semantics(spark):
    from resolve_overlap_and_gap_spark.operators.textstats import blocklist_filter

    pages = spark.createDataFrame(
        [(1, "ads.example.com"), (2, "example.com"), (3, "safeexample.com"),
         (4, "example.com.evil.org"), (5, "sub.deep.example.com"),
         (6, "org")],
        "doc_id long, host string")
    out = {r.doc_id: r.blocked
           for r in blocklist_filter(pages, ["example.com"]).collect()}
    # suffix semantics on dot boundaries only: 3 (substring, not suffix)
    # and 4 (prefix, not suffix) must NOT block
    assert out == {1: 1, 2: 1, 3: 0, 4: 0, 5: 1, 6: 0}
