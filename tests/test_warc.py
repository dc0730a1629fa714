"""WARC (ISO 28500) source: writer/parser round-trip, gzip members,
boundary behavior, and the Spark extraction operator."""

import datetime

import pytest

from resolve_overlap_and_gap_spark.sources.warc import (
    encode_warc,
    parse_warc,
    synthesize_warc,
    warc_extract,
)


def _mkrecs(n):
    base = datetime.datetime(2026, 1, 1)
    return [{
        "url": f"http://src{g % 5}.example.org/page/{g}",
        "date": (base + datetime.timedelta(seconds=g))
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "status": 404 if g % 7 == 0 else 200,
        "body": f"<html><body>doc {g}</body></html>".encode(),
        "rec_id": f"00000000-0000-0000-0000-{g:012d}",
    } for g in range(n)]


@pytest.mark.parametrize("gz", [True, False])
def test_warc_roundtrip(gz):
    recs = _mkrecs(5)
    out = parse_warc(encode_warc(recs, gzip_members=gz))
    assert len(out) == 5
    for g, r in enumerate(out):
        assert r["rec_idx"] == g
        assert r["url"] == recs[g]["url"]
        assert r["warc_ts"] == recs[g]["date"]
        assert r["status"] == recs[g]["status"]
        assert r["body"] == recs[g]["body"]
        assert r["body_len"] == len(recs[g]["body"])
        assert r["rec_type"] == "response"


def test_warc_truncation_and_garbage_rejected():
    buf = encode_warc(_mkrecs(2), gzip_members=False)
    with pytest.raises(ValueError):
        parse_warc(buf[:40])
    with pytest.raises(ValueError):
        parse_warc(b"NOTAWARCRECORD\r\n\r\n")
    # truncated gzip member
    gzbuf = encode_warc(_mkrecs(1), gzip_members=True)
    with pytest.raises(ValueError):
        parse_warc(gzbuf[:-8])


def test_warc_trailing_crlf_tolerated():
    buf = encode_warc(_mkrecs(1), gzip_members=False) + b"\r\n\r\n"
    assert len(parse_warc(buf)) == 1


@pytest.mark.spark
def test_warc_extract_operator(spark):
    files = synthesize_warc(spark, 6, recs_per_file=4, partitions=2)
    rows = warc_extract(files).collect()
    assert len(rows) == 24
    by_key = {(r.file_id, r.rec_idx): r for r in rows}
    for f in range(6):
        for i in range(4):
            g = f * 4 + i
            r = by_key[(f, i)]
            assert r.url == f"http://src{g % 5}.example.org/page/{g}"
            assert r.status == (404 if g % 7 == 0 else 200)
            assert r.body_text == f"<html><body>doc {g}</body></html>"
            assert r.body_len == 30 + len(str(g))
