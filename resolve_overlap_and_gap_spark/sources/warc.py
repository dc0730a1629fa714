"""WARC (ISO 28500) ingestion — the container Common Crawl actually ships.

The reference engine's ingest reads page tables; a crawl-scale pipeline
starts one step earlier, at WARC files: length-prefixed records
(``WARC/1.0`` + headers + Content-Length + payload), usually stored as
multi-member gzip (one gzip member per record — the ``.warc.gz`` layout
that makes records independently seekable).  This module implements:

* ``encode_warc(records, gzip_members=True)`` — a real writer (response
  records wrapping an HTTP/1.1 response), used by the deterministic
  synthesizer so tests/benches pay genuine parse + gunzip costs.
* ``parse_warc(buf)`` — a real reader: multi-member gzip sniff + inflate,
  header block parse, Content-Length-driven record walk, HTTP status +
  body split.  O(bytes) per file, no regex backtracking.
* ``warc_extract(df)`` — the Spark operator: mapInPandas over an Arrow
  batch of (file_id, payload) rows -> one row per record.  At 100 TB the
  unit of parallelism is the WARC FILE (Common Crawl's ~1 GB shards):
  files are independent, so the operator is embarrassingly parallel and
  the only shuffle is whatever the caller does downstream.

Boundary: 'revisit'/'request'/other record types parse fine (they are
just headers + payload); truncated records and non-gzip non-plain bytes
raise ValueError at the parse boundary.
"""

from __future__ import annotations

import gzip
import io
import struct  # noqa: F401  (kept for parity with sibling sources)
import zlib
from typing import Iterator

import numpy as np  # noqa: F401
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"


def encode_warc(records: list[dict], gzip_members: bool = True) -> bytes:
    """records: [{url, date, status, body(bytes), rec_id}] -> WARC bytes.
    Each record is a 'response' record whose payload is a minimal
    HTTP/1.1 response; gzip_members writes one gzip member per record
    (the .warc.gz convention)."""
    out = []
    for r in records:
        body = r["body"]
        http = (f"HTTP/1.1 {r['status']} "
                f"{'OK' if r['status'] == 200 else 'X'}\r\n"
                f"Content-Type: text/html\r\n"
                f"Content-Length: {len(body)}\r\n\r\n").encode() + body
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:uuid:{r['rec_id']}>\r\n".encode()
            + f"WARC-Date: {r['date']}\r\n".encode()
            + f"WARC-Target-URI: {r['url']}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(http)}\r\n".encode()
            + _CRLF
        )
        rec = hdr + http + _CRLF + _CRLF
        out.append(gzip.compress(rec, 6) if gzip_members else rec)
    return b"".join(out)


def _gunzip_members(buf: bytes) -> bytes:
    """Inflate a multi-member gzip stream (the .warc.gz layout)."""
    out = []
    pos = 0
    while pos < len(buf):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(buf[pos:]))
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        pos = len(buf) - len(d.unused_data)
    return b"".join(out)


def parse_warc(buf: bytes) -> list[dict]:
    """WARC bytes (plain or multi-member gzip) -> one dict per record:
    {rec_idx, url, warc_ts, rec_type, status, body_len, body}."""
    if buf[:2] == b"\x1f\x8b":
        buf = _gunzip_members(buf)
    recs = []
    pos = 0
    idx = 0
    while pos < len(buf):
        if buf[pos:pos + 5] != b"WARC/":
            if not buf[pos:].strip(b"\r\n"):
                break
            raise ValueError(f"bad WARC record header at offset {pos}")
        hend = buf.find(b"\r\n\r\n", pos)
        if hend < 0:
            raise ValueError("truncated WARC header block")
        headers = {}
        for line in buf[pos:hend].decode("utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers.get("content-length", "0"))
        payload = buf[hend + 4:hend + 4 + clen]
        if len(payload) != clen:
            raise ValueError("truncated WARC payload")
        pos = hend + 4 + clen
        # consume the two record-terminating CRLFs (tolerant of EOF)
        while buf[pos:pos + 2] == _CRLF:
            pos += 2
        status = 0
        body = payload
        if headers.get("warc-type") == "response" and payload[:5] == b"HTTP/":
            line_end = payload.find(b"\r\n")
            parts = payload[:line_end].split(b" ")
            status = int(parts[1]) if len(parts) > 1 else 0
            bstart = payload.find(b"\r\n\r\n")
            body = payload[bstart + 4:] if bstart >= 0 else b""
        recs.append({
            "rec_idx": idx,
            "url": headers.get("warc-target-uri", ""),
            "warc_ts": headers.get("warc-date", ""),
            "rec_type": headers.get("warc-type", ""),
            "status": status,
            "body_len": len(body),
            "body": body,
        })
        idx += 1
    return recs


WARC_SCHEMA = T.StructType([
    T.StructField("file_id", T.LongType()),
    T.StructField("rec_idx", T.IntegerType()),
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.StringType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("body_len", T.LongType()),
    T.StructField("body_text", T.StringType()),
])


def warc_extract(files: DataFrame, payload_col: str = "payload",
                 id_col: str = "file_id") -> DataFrame:
    """Spark operator: (file_id, payload binary) -> one row per WARC
    record, via mapInPandas (Arrow batches in/out; the file is the unit
    of parallelism, mirroring Common Crawl's shard layout)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, buf in zip(pdf[id_col], pdf[payload_col]):
                for r in parse_warc(bytes(buf)):
                    rows.append((int(fid), r["rec_idx"], r["url"],
                                 r["warc_ts"], r["status"], r["body_len"],
                                 r["body"].decode("utf-8", "replace")))
            yield pd.DataFrame(
                rows, columns=["file_id", "rec_idx", "url", "warc_ts",
                               "status", "body_len", "body_text"])

    return files.mapInPandas(run, WARC_SCHEMA)


def synthesize_warc(spark: SparkSession, n_files: int,
                    recs_per_file: int = 4, partitions: int = 8,
                    gzip_members: bool = True) -> DataFrame:
    """Deterministic WARC shard table: file k holds records with global id
    gid = k*recs_per_file + i, url http://src{gid%5}.example.org/page/{gid},
    date 2026-01-01T00:00:00Z + gid seconds, status 404 when gid%7==0 else
    200, body '<html><body>doc {gid}</body></html>' — every field has a
    SQL closed form (warc_extract oracle) while the payload bytes are a
    REAL gzip'd WARC stream the parser must genuinely walk."""
    import datetime

    base = datetime.datetime(2026, 1, 1)

    @F.pandas_udf(T.BinaryType())
    def payload(fid: pd.Series) -> pd.Series:
        out = []
        for f in fid:
            recs = []
            for i in range(recs_per_file):
                gid = int(f) * recs_per_file + i
                dt = base + datetime.timedelta(seconds=gid)
                recs.append({
                    "url": f"http://src{gid % 5}.example.org/page/{gid}",
                    "date": dt.strftime("%Y-%m-%dT%H:%M:%SZ"),
                    "status": 404 if gid % 7 == 0 else 200,
                    "body": f"<html><body>doc {gid}</body></html>".encode(),
                    "rec_id": f"00000000-0000-0000-0000-{gid:012d}",
                })
            out.append(encode_warc(recs, gzip_members=gzip_members))
        return pd.Series(out)

    base_df = spark.range(0, n_files, 1, partitions).select(
        F.col("id").alias("file_id"))
    return base_df.select("file_id", payload("file_id").alias("payload"))
