"""WARC source: Common-Crawl archive files → the engine's pages table.

The north rule's input is an Iceberg table of Common-Crawl-style pages
``(url, warc_ts, html, text, lang)`` — but Common Crawl itself ships
WARC files (ISO 28500): ~1 GB archives of length-prefixed records, one
gzip member per record. ``read_warc`` turns a directory of ``.warc`` /
``.warc.gz`` files into that table shape.

Scale model: Spark's ``binaryFile`` source gives one row per archive
file; a ``mapInPandas`` pass parses each archive into its response
records. The WARC file is exactly Common Crawl's unit of parallelism
(100 TB ≈ 10^5 files → 10^5 independent tasks), so the pass needs no
shuffle at all, and the per-file Python work is sequential streaming
parse — the payload bytes cross into Arrow once. Record-level gzip
(members concatenated back to back) is what Python's zlib handles
natively when asked to keep inflating; whole-file-gzip WARCs decompress
identically.

Reference analog: none (the reference fetches live HTTP). This is the
ingest edge the reference's corpus would arrive through at CC scale.
"""

from __future__ import annotations

import io
import zlib
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

WARC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, "
    "record_type string, warc_file string"
)


def _inflate_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (Common Crawl writes one
    member per record); raw bytes pass through untouched."""
    if not data[:2] == b"\x1f\x8b":
        return data
    out = []
    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    buf = data
    while buf:
        out.append(d.decompress(buf))
        buf = d.unused_data
        if buf:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        else:
            break
    return b"".join(out)


def parse_warc_bytes(data: bytes, warc_file: str = "") -> Iterator[dict]:
    """Stream records out of one WARC archive's bytes. Yields dicts of
    WARC_SCHEMA fields for every record carrying a Target-URI (response
    / resource / revisit); HTTP response payloads are stripped of their
    HTTP header block so ``html`` is the entity body alone."""
    stream = io.BytesIO(_inflate_members(data))
    while True:
        version = stream.readline()
        if not version:
            return
        if not version.strip():  # inter-record CRLF padding
            continue
        if not version.startswith(b"WARC/"):
            # damaged archive tail: stop at the first corrupt record
            # rather than emitting garbage rows
            return
        headers: dict[bytes, bytes] = {}
        while True:
            line = stream.readline()
            if not line or not line.strip():
                break
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b"0"))
        except ValueError:
            return
        payload = stream.read(length)
        rtype = headers.get(b"warc-type", b"").decode("ascii", "replace")
        uri = headers.get(b"warc-target-uri")
        if uri is not None:
            body = payload
            ctype = headers.get(b"content-type", b"")
            if rtype == "response" and ctype.startswith(b"application/http"):
                # strip the HTTP header block; tolerate bare-LF servers
                for sep in (b"\r\n\r\n", b"\n\n"):
                    idx = payload.find(sep)
                    if idx >= 0:
                        body = payload[idx + len(sep):]
                        break
            ts = None
            raw_ts = headers.get(b"warc-date")
            if raw_ts:
                try:
                    ts = datetime.fromisoformat(
                        raw_ts.decode("ascii").replace("Z", "+00:00")
                    ).astimezone(timezone.utc).replace(tzinfo=None)
                except ValueError:
                    ts = None
            yield {
                "url": uri.decode("utf-8", "replace").strip("<>"),
                "warc_ts": ts,
                "html": body,
                "record_type": rtype,
                "warc_file": warc_file,
            }


def read_warc(
    spark, path: str, record_types: tuple[str, ...] = ("response",)
) -> DataFrame:
    """Directory (or glob) of ``.warc`` / ``.warc.gz`` files → DataFrame
    of WARC_SCHEMA rows, one task per archive file (no shuffle)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )
    wanted = set(record_types)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                rows = [
                    r
                    for r in parse_warc_bytes(row["content"], row["path"])
                    if r["record_type"] in wanted
                ]
                if rows:
                    yield pd.DataFrame(rows)

    return files.mapInPandas(_parse, schema=WARC_SCHEMA)


def pages_from_warc(spark, path: str) -> DataFrame:
    """WARC archives → the engine's pages-table shape
    ``(url, warc_ts, html, text, lang)`` (text/lang null: extraction is
    the engine's job, not the source's)."""
    from pyspark.sql import functions as F

    return read_warc(spark, path).select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
