"""WARC source: record framing, HTTP splitting, gzip members, pipeline feed."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from rtstore_spark.sources.warc import read_warc

_HTML = (
    b"<html><head><title>Pg</title></head><body><p>the quick brown fox "
    b"jumps over the lazy dog and the cat is in the house near the "
    b"river</p></body></html>"
)


def _record(wtype: str, uri: str | None, body: bytes) -> bytes:
    hdrs = [b"WARC/1.0", b"WARC-Type: " + wtype.encode()]
    if uri:
        hdrs.append(b"WARC-Target-URI: " + uri.encode())
    hdrs += [
        b"WARC-Date: 2026-01-02T03:04:05Z",
        b"Content-Length: " + str(len(body)).encode(),
    ]
    return b"\r\n".join(hdrs) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _http(body: bytes, status: int = 200, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    recs = [
        _record("warcinfo", None, b"software: test\r\n"),
        _record("response", "http://a.example/page", _http(_HTML)),
        _record("response", "http://b.example/x", _http(b"WARC/1.0 inside body", ctype="text/plain")),
        _record("request", "http://a.example/page", b"GET /page HTTP/1.1\r\n"),
    ]
    (d / "plain.warc").write_bytes(b"".join(recs))
    # Common Crawl layout: each record its own gzip member, concatenated
    (d / "members.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs)
    )
    return d


class TestReadWarc:
    def test_responses_parsed(self, spark, warc_dir):
        df = read_warc(spark, str(warc_dir / "plain.warc"))
        rows = {r["url"]: r for r in df.collect()}
        assert set(rows) == {"http://a.example/page", "http://b.example/x"}
        a = rows["http://a.example/page"]
        assert a["warc_type"] == "response"
        assert a["http_status"] == 200
        assert a["content_type"] == "text/html"
        assert a["payload_text"] == _HTML.decode()
        assert a["warc_date"] == "2026-01-02T03:04:05Z"
        # a payload containing 'WARC/1.0' must not split the framing
        assert rows["http://b.example/x"]["payload_text"] == "WARC/1.0 inside body"

    def test_gzip_members_equal_plain(self, spark, warc_dir):
        plain = read_warc(spark, str(warc_dir / "plain.warc")).drop(
            "warc_file"
        )
        gz = read_warc(spark, str(warc_dir / "members.warc.gz")).drop("warc_file")
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, gz.collect()))

    def test_record_type_filter_and_binary(self, spark, warc_dir):
        all_types = read_warc(
            spark, str(warc_dir / "plain.warc"), record_types=(), binary_payload=True
        )
        got = {r["warc_type"] for r in all_types.collect()}
        assert got == {"warcinfo", "response", "request"}
        b = all_types.filter(F.col("url") == "http://a.example/page").filter(
            F.col("warc_type") == "response"
        ).first()
        assert bytes(b["payload"]) == _HTML

    def test_feeds_html_pipeline(self, spark, warc_dir):
        from rtstore_spark.operators.pipeline import CorpusPrepConfig, prepare_corpus

        docs = read_warc(spark, str(warc_dir / "plain.warc")).filter(
            F.col("content_type") == "text/html"
        ).select(F.col("url").alias("doc_id"), F.col("payload_text").alias("body"))
        out = prepare_corpus(
            docs, "body", "doc_id",
            CorpusPrepConfig(min_tokens=5, html_input=True),
        ).collect()
        assert len(out) == 1
        assert out[0]["body"].startswith("the quick brown fox")
