"""WARC ingest: spec-layout round trip (plain + per-record-gzip like
Common Crawl), truncated-file tolerance, HTTP block parsing, and the
distributed binaryFile path into the pages pipeline."""

from __future__ import annotations

import datetime as dt
import gzip

from data_quality_assessment_spark.sources import warc


def _recs():
    base = dt.datetime(2023, 5, 1, 12, 0, 0)
    return [
        ("https://a.example/x", base, b"<html><body>hello a</body></html>"),
        ("https://b.example/y", base + dt.timedelta(seconds=5),
         "<html><body>unicode é中</body></html>".encode()),
        ("https://c.example/z", base + dt.timedelta(seconds=9), b""),
    ]


def test_roundtrip_plain():
    raw = warc.write_warc(_recs())
    rows = warc.records_from_file_bytes(raw)
    assert len(rows) == 3
    for (url, ts, body), row in zip(_recs(), rows):
        assert row[0] == url
        assert row[1] == ts
        assert row[2] == "response"
        assert row[3] == "text/html"
        assert row[4] == 200
        assert row[5] == body


def test_roundtrip_gzip_members():
    """CC-style .warc.gz: concatenated per-record gzip members."""
    raw = warc.write_warc(_recs(), compress=True)
    assert raw[:2] == b"\x1f\x8b"
    rows = warc.records_from_file_bytes(raw)
    assert [r[0] for r in rows] == [u for u, _, _ in _recs()]


def test_truncated_file_yields_prefix():
    raw = warc.write_warc(_recs())
    cut = raw[: int(len(raw) * 0.6)]  # inside record 2's block
    rows = warc.records_from_file_bytes(cut)
    assert 1 <= len(rows) < 3
    assert rows[0][0] == "https://a.example/x"


def test_non_http_block_passthrough():
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 9\r\n\r\n"
        b"robots: x"
        b"\r\n\r\n"
    )
    rows = warc.records_from_file_bytes(rec)
    assert rows[0][2] == "warcinfo"
    assert rows[0][4] is None
    assert rows[0][5] == b"robots: x"


def test_read_warc_distributed_into_pipeline(spark, tmp_path):
    """binaryFile scan -> parse -> pages schema -> the flagship
    pipeline runs end-to-end on WARC-born rows."""
    from pyspark.sql import functions as F

    from data_quality_assessment_spark.plans.pipeline import (
        pages_out, run_pipeline,
    )

    (tmp_path / "a.warc").write_bytes(warc.write_warc(_recs()))
    (tmp_path / "b.warc.gz").write_bytes(
        warc.write_warc(
            [("https://d.example/w", dt.datetime(2023, 5, 2),
              b"<html><body>the data page is open and fine</body></html>")],
            compress=True,
        )
    )
    df = warc.read_warc(spark, str(tmp_path) + "/*")
    assert df.count() == 4
    pages = df.select(
        "url", "warc_ts", "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
    out = pages_out(run_pipeline(pages)).collect()
    assert len(out) == 4
    by_url = {r.url: r for r in out}
    assert by_url["https://d.example/w"].nw > 0
