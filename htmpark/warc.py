"""WARC (ISO 28500 / Common Crawl) source for the extraction pipeline.

The north rule's input is "Common-Crawl-style web pages"; the archival
interchange format those actually arrive in is WARC — concatenated
records, each optionally its own gzip member (the Common Crawl layout,
which keeps per-record random access while staying one file per shard).
This module is a stdlib-only reader/writer pair plus the Spark source
that turns a directory of ``.warc`` / ``.warc.gz`` shards into the
pipeline's canonical ``(url, warc_ts, html)`` frame.

Not derived from the reference (zadean/htmerl parses HTML only, no I/O
formats); the record grammar follows the public WARC 1.0/1.1 spec:
``WARC/1.x`` header block terminated by CRLF CRLF, ``Content-Length``
octets of block, CRLF CRLF record separator.  ``response`` records carry
an HTTP message whose payload (after the HTTP header block) is the page
body.

Scale shape: Spark reads shards via the built-in ``binaryFile`` source —
ONE task per shard, which is exactly the Common Crawl unit of work
(~1 GB gzip per shard, tens of thousands of shards per crawl, so file
count >> cluster parallelism and per-file tasks saturate any executor
fleet).  Record splitting + gunzip run inside an Arrow-batched
mapInPandas (no per-row Python); downstream re-parallelization beyond
file granularity is extract_pages' salted repartition, decided there.
Malformed shard tails are tolerated and COUNTED (never silently
dropped): each emitted row carries the shard-level truncated-record
count so lineage audits can find rotten shards.
"""
from __future__ import annotations

import zlib
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

_CRLF2 = b"\r\n\r\n"


def gunzip_members(buf: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the Common Crawl WARC
    layout: one member per record).  Plain input is returned unchanged."""
    if not buf.startswith(b"\x1f\x8b"):
        return buf
    out = []
    while buf:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(buf))
        out.append(d.flush())
        buf = d.unused_data
        if buf and not buf.startswith(b"\x1f\x8b"):
            break  # trailing non-gzip garbage: surfaced by record parsing
    return b"".join(out)


def _parse_header_block(block: bytes) -> dict:
    """'Name: value' lines -> dict (names lower-cased; first line kept
    under 'version')."""
    lines = block.split(b"\r\n")
    hdr = {"version": lines[0].decode("ascii", "replace")}
    for ln in lines[1:]:
        if b":" in ln:
            k, v = ln.split(b":", 1)
            hdr[k.strip().lower().decode("ascii", "replace")] = \
                v.strip().decode("ascii", "replace")
    return hdr


def iter_warc_records(buf: bytes):
    """Yield ``(headers, body)`` per WARC record; gzip members handled.

    ``headers`` is the parsed WARC header dict; ``body`` is the raw record
    block (for ``response`` records: an HTTP message).  A truncated final
    record raises ``ValueError`` — callers that must tolerate rotten
    shard tails use :func:`parse_warc_shard`, which counts instead."""
    buf = gunzip_members(buf)
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and buf[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        end_hdr = buf.find(_CRLF2, pos)
        if end_hdr < 0 or not buf.startswith(b"WARC/", pos):
            raise ValueError(f"malformed WARC header at offset {pos}")
        hdr = _parse_header_block(buf[pos:end_hdr])
        try:
            length = int(hdr["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"missing Content-Length at offset {pos}")
        body_start = end_hdr + 4
        if body_start + length > n:
            raise ValueError(f"truncated record at offset {pos}")
        yield hdr, buf[body_start:body_start + length]
        pos = body_start + length


def http_payload(body: bytes) -> bytes:
    """Payload of an HTTP message block (everything after the header
    CRLF CRLF; the whole block if no header separator is present)."""
    sep = body.find(_CRLF2)
    return body[sep + 4:] if sep >= 0 else body


def parse_warc_shard(buf: bytes):
    """Tolerant shard parse: ``(pages, truncated)`` where pages is a list
    of ``(url, warc_date_str, html_bytes)`` from ``response`` records and
    ``truncated`` counts parse aborts (0 or 1 per shard — a WARC error
    makes the remainder of the shard unaddressable, which is precisely
    what the per-partition lineage metrics must surface)."""
    pages = []
    truncated = 0
    try:
        for hdr, body in iter_warc_records(buf):
            if hdr.get("warc-type") != "response":
                continue
            url = hdr.get("warc-target-uri", "")
            pages.append((url, hdr.get("warc-date", ""), http_payload(body)))
    except ValueError:
        truncated = 1
    return pages, truncated


def _parse_warc_date(s: str):
    """WARC-Date (ISO 8601 'YYYY-MM-DDTHH:MM:SSZ') -> naive-UTC datetime
    (matches the pipeline's TIMESTAMP_NTZ convention); None if absent."""
    if not s:
        return None
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        return dt.astimezone(timezone.utc).replace(tzinfo=None)
    except ValueError:
        return None


READ_WARC_SCHEMA = ("url string, warc_ts timestamp_ntz, html binary, "
                    "lang string, shard string, shard_truncated int")


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of ``.warc`` / ``.warc.gz`` shards -> DataFrame
    (url, warc_ts, html, lang, shard, shard_truncated) — the pipeline's
    input-hint shape (``lang`` is NULL: a crawl archive carries no
    language; text_lang_id annotates it post-extraction) plus lineage.

    ``binaryFile`` scan (one task per shard — the Common Crawl work unit)
    feeding an Arrow-batched mapInPandas record splitter; ``shard`` +
    ``shard_truncated`` ride along for per-partition lineage (the
    run_extraction manifest pattern: errors are counted, never silently
    dropped)."""
    import pandas as pd

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*")
             .load(path)
             .select("path", "content"))

    def split(batches):
        for pdf in batches:
            out = {"url": [], "warc_ts": [], "html": [],
                   "shard": [], "shard_truncated": []}
            for p, content in zip(pdf["path"], pdf["content"]):
                pages, truncated = parse_warc_shard(bytes(content))
                for url, date_s, payload in pages:
                    out["url"].append(url)
                    out["warc_ts"].append(_parse_warc_date(date_s))
                    out["html"].append(payload)
                    out["shard"].append(p)
                    out["shard_truncated"].append(truncated)
            # explicit dtypes: an all-empty batch otherwise infers float64
            # columns, which Arrow cannot cast to timestamp/int
            yield pd.DataFrame({
                "url": pd.Series(out["url"], dtype="object"),
                "warc_ts": pd.to_datetime(
                    pd.Series(out["warc_ts"], dtype="object")),
                "html": pd.Series(out["html"], dtype="object"),
                "lang": pd.Series([None] * len(out["url"]),
                                  dtype="object"),
                "shard": pd.Series(out["shard"], dtype="object"),
                "shard_truncated": pd.Series(out["shard_truncated"],
                                             dtype="int32"),
            })

    return files.mapInPandas(split, READ_WARC_SCHEMA)


def write_warc(path: str, records, gzip_members: bool = False) -> int:
    """Deterministic WARC writer (tests + the export sink twin).

    ``records``: iterable of ``(url, warc_date_str, html_bytes)``.  Each
    becomes a ``response`` record wrapping a minimal HTTP 200 message;
    ``gzip_members=True`` writes the Common Crawl layout (one gzip member
    per record; zlib carries no mtime, so output is byte-deterministic).
    Returns the record count."""
    return _append_warc(path, records, gzip_members, fresh=True)


def write_warc_shards(df: DataFrame, out_dir: str,
                      gzip_members: bool = True) -> list:
    """Distributed WARC export: ONE ``.warc(.gz)`` shard per input
    partition — the inverse of :func:`read_warc`, for handing extracted
    or re-filtered corpora back to archive consumers.

    Input frame: ``(url, warc_ts, html)`` (extra columns ignored).  Each
    executor task streams its partition into
    ``{out_dir}/part-{pid:05d}.warc[.gz]`` and emits one manifest row —
    the job's collected result is the manifest ``[(shard, n_records,
    n_bytes)]``, tiny regardless of corpus size (same
    audit-before-publish shape as run_extraction's manifest; the page
    data itself never touches the driver).  Shard size = partition size:
    callers control it with repartition, exactly how Common Crawl sizes
    its ~1 GB shards."""
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_members else ".warc"

    def dump(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        n = 0
        for pdf in batches:
            recs = []
            for url, ts, html in zip(pdf["url"], pdf["warc_ts"],
                                     pdf["html"]):
                date_s = ("" if ts is None or pd.isna(ts)
                          else pd.Timestamp(ts).strftime(
                              "%Y-%m-%dT%H:%M:%SZ"))
                recs.append((url, date_s, bytes(html)))
            # append mode: write_warc opens fresh, so buffer per batch
            n += _append_warc(path, recs, gzip_members, fresh=(n == 0))
        size = os.path.getsize(path) if n else 0
        yield pd.DataFrame({"shard": pd.Series([path], dtype="object"),
                            "n_records": pd.Series([n], dtype="int64"),
                            "n_bytes": pd.Series([size], dtype="int64")})

    manifest = (df.select("url", "warc_ts", "html")
                .mapInPandas(dump, "shard string, n_records long, "
                                   "n_bytes long")
                .collect())
    return [(r.shard, r.n_records, r.n_bytes) for r in manifest
            if r.n_records > 0]


def _append_warc(path: str, records, gzip_members: bool,
                 fresh: bool) -> int:
    """write_warc's framing, append-capable (multi-batch partitions)."""
    n = 0
    with open(path, "wb" if fresh else "ab") as f:
        for url, date_s, html in records:
            http = (b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: text/html\r\n\r\n" + html)
            hdr = (f"WARC/1.0\r\n"
                   f"WARC-Type: response\r\n"
                   f"WARC-Target-URI: {url}\r\n"
                   f"WARC-Date: {date_s}\r\n"
                   f"Content-Type: application/http; msgtype=response\r\n"
                   f"Content-Length: {len(http)}\r\n\r\n").encode("ascii")
            rec = hdr + http + _CRLF2
            if gzip_members:
                gz = zlib.compressobj(9, zlib.DEFLATED, 31)
                rec = gz.compress(rec) + gz.flush()
            f.write(rec)
            n += 1
    return n
