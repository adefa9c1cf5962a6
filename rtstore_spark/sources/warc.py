"""WARC source: the crawl-archive front door of a web training-data run.

Reads ISO 28500 WARC files (the Common Crawl container format) into a
DataFrame of records — one row per WARC record, HTTP responses split
into status/content-type/payload — ready to feed
``operators.web.extract_html_text`` / ``prepare_corpus(html_input=True)``.

Scale shape: parallelism is per FILE. A crawl ships as tens of
thousands of ~1 GB archives (Common Crawl: ~64k per snapshot), so
file-granular tasks saturate any executor count without splitting
inside an archive — which gzip members make impossible to do cheaply
anyway (each record is its own gzip member; a byte-offset split lands
mid-member). Each task holds one archive decompressed in memory
(~1-4 GB); size executor memory accordingly or re-shard giant archives
upstream. The parse is a ``mapInPandas`` pass (Arrow-batched, one
Python traversal per file, no per-record round-trips), and everything
downstream of it is ordinary JVM-side Column work.

Beyond-reference source (the reference ingests signed mutations, not
crawl archives); format per the public ISO 28500 / WARC 1.1 spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SCHEMA = (
    "warc_file string, record_offset bigint, warc_type string, url string,"
    " warc_date string, http_status int, content_type string,"
    " payload_text string"
)
_SCHEMA_BIN = _SCHEMA + ", payload binary"


def _parse_warc_bytes(data: bytes):
    """Walk WARC records by Content-Length (the only correct framing —
    payloads may legally contain 'WARC/1.0' lines). Yields
    (offset, headers: dict[lower,str], body: bytes). Tolerates both CRLF
    and bare-LF header framing and stops cleanly at trailing garbage."""
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos) or data.startswith(b"\n", pos):
            pos += 2 if data.startswith(b"\r\n", pos) else 1
        if not data.startswith(b"WARC/", pos):
            break
        offset = pos
        cut = data.find(b"\r\n\r\n", pos)
        lfcut = data.find(b"\n\n", pos)
        if cut == -1 or (lfcut != -1 and lfcut < cut):
            cut, sep = lfcut, 2
        else:
            sep = 4
        if cut == -1:
            break
        headers: dict[str, str] = {}
        for line in data[pos:cut].decode("utf-8", "replace").splitlines()[1:]:
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break  # unframed record: cannot locate the next one safely
        body = data[cut + sep : cut + sep + clen]
        yield offset, headers, body
        pos = cut + sep + clen


def _split_http(body: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, payload) from an HTTP response block."""
    cut = body.find(b"\r\n\r\n")
    sep = 4
    if cut == -1:
        cut, sep = body.find(b"\n\n"), 2
    if cut == -1 or not body.startswith(b"HTTP/"):
        return None, None, body
    head = body[:cut].decode("utf-8", "replace")
    lines = head.splitlines()
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if _ and k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, body[cut + sep :]


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    binary_payload: bool = False,
) -> DataFrame:
    """WARC archive(s) at ``path`` (glob ok; .warc and .warc.gz — gzip
    with one member per record, the Common Crawl layout, decompresses
    transparently via Python's multi-member gzip handling) → one row per
    record of the requested ``record_types``:

    (warc_file, record_offset, warc_type, url, warc_date, http_status,
    content_type, payload_text[, payload]).

    ``record_offset`` is the byte offset in the DECOMPRESSED stream —
    with ``warc_file`` it is a stable record identity for dedup joins
    and re-fetch. ``payload_text`` is the HTTP body (or raw record body
    for non-response types) decoded utf-8-with-replacement — feed it to
    the html pipeline; ``binary_payload=True`` adds the raw bytes column
    for multimodal payloads (images/audio) at the cost of shipping the
    body twice.
    """
    import gzip

    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    wanted = tuple(t.lower() for t in record_types)
    with_bin = binary_payload

    def parse(batches):
        cols = [
            "warc_file", "record_offset", "warc_type", "url", "warc_date",
            "http_status", "content_type", "payload_text",
        ] + (["payload"] if with_bin else [])
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    data = gzip.decompress(data)
                for off, hdrs, body in _parse_warc_bytes(data):
                    wtype = hdrs.get("warc-type", "").lower()
                    if wanted and wtype not in wanted:
                        continue
                    if wtype == "response":
                        status, ctype, payload = _split_http(body)
                    else:
                        status, payload = None, body
                        ctype = hdrs.get("content-type")
                    row = [
                        fpath, off, wtype,
                        hdrs.get("warc-target-uri"), hdrs.get("warc-date"),
                        status, ctype,
                        payload.decode("utf-8", "replace"),
                    ]
                    if with_bin:
                        row.append(bytearray(payload))
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, _SCHEMA_BIN if binary_payload else _SCHEMA)
