"""WARC source: record grammar round trip, gzip-member layout, tolerant
shard tails, and the Spark binaryFile -> mapInPandas path feeding the
extraction pipeline."""
import datetime
import os

import pytest

from htmpark.warc import (gunzip_members, http_payload, iter_warc_records,
                          parse_warc_shard, read_warc, write_warc)

PAGES = [
    ("https://a.example.com/p/1", "2024-01-01T00:00:00Z",
     b"<!DOCTYPE html><html><body><p>one &amp; done</p></body></html>"),
    ("https://b.example.com/", "2024-01-02T12:30:45Z",
     b"<p>two</p>"),
    # body with CRLFCRLF inside: Content-Length framing must carry it
    # intact (a split-on-separator parser would corrupt it).  NUL survives
    # per quirk Q4; invalid-UTF-8 bytes are exercised in the
    # library-surface round-trip tests (Arrow string columns cannot carry
    # surrogateescape lone surrogates, so they stay out of the Spark leg)
    ("https://c.example.com/x?q=1", "2024-03-05T23:59:59Z",
     b"<p>three</p>\r\n\r\n<p>more</p>\x00"),
]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_round_trip(tmp_path, gz):
    p = str(tmp_path / ("t.warc.gz" if gz else "t.warc"))
    assert write_warc(p, PAGES, gzip_members=gz) == 3
    raw = open(p, "rb").read()
    if gz:
        assert raw.startswith(b"\x1f\x8b")
    recs = list(iter_warc_records(raw))
    assert len(recs) == 3
    for (url, date_s, html), (hdr, body) in zip(PAGES, recs):
        assert hdr["warc-type"] == "response"
        assert hdr["warc-target-uri"] == url
        assert hdr["warc-date"] == date_s
        assert http_payload(body) == html


def test_warc_header_at_max_length_boundary():
    """A legal header block of EXACTLY _MAX_HEADER bytes parses (r6
    ADVICE: the terminator used to be searched only inside the block
    bound, rejecting headers in (_MAX_HEADER-4, _MAX_HEADER]); one byte
    over the limit is still rejected as malformed."""
    from htmpark.warc import _MAX_HEADER

    base = (b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"Content-Length: 1\r\n"
            b"X-Pad: ")

    def rec(block_len):
        return base + b"p" * (block_len - len(base)) + b"\r\n\r\n" + b"X"

    for ln in (_MAX_HEADER - 4, _MAX_HEADER - 1, _MAX_HEADER):
        out = list(iter_warc_records(rec(ln)))
        assert len(out) == 1 and out[0][1] == b"X", ln
    with pytest.raises(ValueError, match="no CRLFCRLF"):
        list(iter_warc_records(rec(_MAX_HEADER + 1)))


def test_warc_writer_is_deterministic(tmp_path):
    a, b = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    write_warc(a, PAGES, gzip_members=True)
    write_warc(b, PAGES, gzip_members=True)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_warc_tolerant_shard_tail(tmp_path):
    """A truncated final record is COUNTED, never silently dropped, and
    the records before it still parse; non-response records are
    filtered."""
    p = str(tmp_path / "t.warc")
    write_warc(p, PAGES)
    raw = open(p, "rb").read()
    # append a warcinfo record then a truncated response record
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
            b"inf\n" + b"\r\n\r\n")
    trunc = (b"WARC/1.0\r\nWARC-Type: response\r\n"
             b"WARC-Target-URI: https://d.example.com/\r\n"
             b"Content-Length: 999\r\n\r\nshort")
    pages, truncated = parse_warc_shard(raw + info + trunc)
    assert [u for u, _, _ in pages] == [u for u, _, _ in PAGES]
    assert truncated == 1
    # clean shard: zero truncations
    assert parse_warc_shard(raw)[1] == 0
    # garbage after a valid gzip member surfaces as a truncation too,
    # and the pages before it still parse byte-identically
    gzp = str(tmp_path / "t2.warc.gz")
    write_warc(gzp, PAGES, gzip_members=True)
    dirty = open(gzp, "rb").read() + b"not gzip"
    pages, truncated = parse_warc_shard(dirty)
    assert pages == [(u, d, h) for u, d, h in PAGES]
    assert truncated == 1


def test_warc_corrupt_gzip_member_is_counted(tmp_path):
    """A bit-flipped gzip member raises zlib.error inside zlib; the
    reader must convert it to the tolerated-and-counted path (r5 ADVICE:
    zlib.error used to escape the splitter and kill the whole task).
    Records from members before the rot still parse."""
    import zlib

    p = str(tmp_path / "t.warc.gz")
    write_warc(p, PAGES, gzip_members=True)
    raw = bytearray(open(p, "rb").read())
    # find the second member boundary and flip a byte inside its deflate
    # stream (well past the header so the member still starts cleanly)
    d = zlib.decompressobj(wbits=31)
    d.decompress(bytes(raw))
    second = len(raw) - len(d.unused_data)
    raw[second + 20] ^= 0xFF
    pages, truncated = parse_warc_shard(bytes(raw))
    assert truncated == 1
    assert [u for u, _, _ in pages] == [PAGES[0][0]]
    assert pages[0][2] == PAGES[0][2]


def test_warc_streaming_is_bounded(tmp_path):
    """Peak Python allocation while iterating a many-member shard stays
    ~one record, not the decompressed shard (the r5 scale-shape fix:
    the old reader materialized the whole decompressed buffer + page
    list).  128 x 64KB bodies = 8 MB raw; bound the peak well under
    half of that."""
    import tracemalloc

    from htmpark.warc import _iter_decompressed

    body = bytes(range(256)) * 256  # 64 KB, incompressible-ish pattern
    pages = [(f"https://s.example.com/{i}", "2024-01-01T00:00:00Z", body)
             for i in range(128)]
    p = str(tmp_path / "big.warc.gz")
    write_warc(p, pages, gzip_members=True)
    buf = open(p, "rb").read()

    tracemalloc.start()
    n = 0
    for hdr, rec_body in iter_warc_records(buf):
        assert http_payload(rec_body) == body
        n += 1
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == 128
    assert peak < 4 << 20, f"peak {peak} bytes — not streaming"

    # the decompress layer alone is bounded too
    tracemalloc.start()
    total = sum(len(c) for c in _iter_decompressed(buf))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert total > 8 << 20
    assert peak < 4 << 20


def test_warc_header_injection_and_utf8(tmp_path):
    """CR/LF in a url is percent-encoded (cannot inject header lines into
    the record grammar) and a non-ASCII url round-trips as UTF-8 instead
    of crashing the executor on .encode('ascii') (r5 ADVICE)."""
    evil = "https://e.example.com/a\r\nWARC-Type: fake"
    utf8 = "https://u.example.com/café/über"
    p = str(tmp_path / "t.warc.gz")
    write_warc(p, [(evil, "2024-01-01T00:00:00Z", b"<p>x</p>"),
                   (utf8, "2024-01-01T00:00:00Z", b"<p>y</p>")],
               gzip_members=True)
    recs = list(iter_warc_records(open(p, "rb").read()))
    assert len(recs) == 2
    assert recs[0][0]["warc-type"] == "response"  # not the injected value
    assert recs[0][0]["warc-target-uri"] == \
        "https://e.example.com/a%0D%0AWARC-Type: fake"
    assert recs[1][0]["warc-target-uri"] == utf8


def test_read_warc_multi_batch_flush(spark, tmp_path):
    """A shard with more pages than the splitter's row threshold flushes
    multiple bounded Arrow batches: every page arrives exactly once."""
    from htmpark.warc import _BATCH_ROWS

    n = _BATCH_ROWS + 700
    pages = [(f"https://m.example.com/{i}", "2024-01-01T00:00:00Z",
              f"<p>{i}</p>".encode()) for i in range(n)]
    d = str(tmp_path)
    write_warc(os.path.join(d, "big.warc.gz"), pages, gzip_members=True)
    got = {r.url: bytes(r.html) for r in read_warc(spark, d).collect()}
    assert len(got) == n
    assert got["https://m.example.com/0"] == b"<p>0</p>"
    assert got[f"https://m.example.com/{n - 1}"] == \
        f"<p>{n - 1}</p>".encode()


def test_read_warc_stream_incremental(spark, tmp_path):
    """The streaming twin picks up ONLY shards that arrived since the
    last micro-batch (file-source commit log): first availableNow run
    lands shard 1's pages, a second run after shard 2 appears appends
    exactly shard 2's pages — no re-reads, no duplicates."""
    from htmpark.warc import read_warc_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    def run_once():
        q = (read_warc_stream(spark, src).select("url", "html")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck).outputMode("append")
             .trigger(availableNow=True).start())
        assert q.awaitTermination(300)

    write_warc(os.path.join(src, "s1.warc"), PAGES[:2])
    run_once()
    assert sorted(r.url for r in spark.read.parquet(out).collect()) == \
        sorted(u for u, _, _ in PAGES[:2])

    write_warc(os.path.join(src, "s2.warc.gz"), PAGES[2:],
               gzip_members=True)
    run_once()
    got = [r.url for r in spark.read.parquet(out).collect()]
    assert sorted(got) == sorted(u for u, _, _ in PAGES)
    assert len(got) == len(set(got))  # exactly-once: no duplicates


def test_read_warc_rotten_shard_sentinel(spark, tmp_path):
    """A shard whose tail is unreadable emits its readable pages plus ONE
    html-NULL lineage sentinel with shard_truncated=1 — so
    max(shard_truncated) GROUP BY shard finds rotten shards even when
    the rot precedes every page."""
    d = str(tmp_path)
    write_warc(os.path.join(d, "ok.warc"), PAGES[:2])
    with open(os.path.join(d, "rotten.warc"), "wb") as f:
        f.write(b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Target-URI: https://r.example.com/\r\n"
                b"Content-Length: 999\r\n\r\nshort")
    rows = read_warc(spark, d).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(os.path.basename(r.shard), []).append(r)
    ok = by_shard["ok.warc"]
    assert len(ok) == 2 and all(r.shard_truncated == 0 for r in ok)
    rot = by_shard["rotten.warc"]
    assert len(rot) == 1
    assert rot[0].url is None and rot[0].html is None
    assert rot[0].shard_truncated == 1

    # the documented production path drops the sentinel before parsing:
    # no phantom NULL-url error row in the extraction output
    from htmpark.job import extract_pages

    out = extract_pages(read_warc(spark, d).select(
        "url", "warc_ts", "html", "lang"), salt_buckets=0).collect()
    assert len(out) == 2
    assert all(r.url is not None and r.parse_ok for r in out)


def test_read_warc_spark_pipeline(spark, tmp_path):
    """Two shards (one plain, one gzip-member) through the Spark source:
    schema, timestamps, lineage columns — then straight into
    extract_pages for byte-parity text."""
    from htmpark.job import extract_pages, read_table

    d = str(tmp_path)
    write_warc(os.path.join(d, "s1.warc"), PAGES[:2])
    write_warc(os.path.join(d, "s2.warc.gz"), PAGES[2:], gzip_members=True)
    df = read_warc(spark, d)
    assert df.columns == ["url", "warc_ts", "html", "lang", "shard",
                          "shard_truncated"]
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == {u for u, _, _ in PAGES}
    r1 = rows["https://a.example.com/p/1"]
    assert r1.warc_ts == datetime.datetime(2024, 1, 1)
    assert bytes(r1.html) == PAGES[0][2]
    assert r1.shard_truncated == 0 and r1.shard.endswith("s1.warc")

    # read_table dispatch
    assert read_table(spark, d, fmt="warc").count() == 3

    # the full pipeline consumes it directly (CRLF page: norm_newlines
    # folds \r\n -> \n per Q1, so extraction still succeeds)
    out = {r.url: r for r in
           extract_pages(df.select("url", "warc_ts", "html", "lang"),
                         salt_buckets=0).collect()}
    assert out["https://a.example.com/p/1"].text == "one & done"
    assert all(r.parse_ok for r in out.values())


def test_write_warc_shards_round_trip(spark, tmp_path):
    """Distributed export: one shard per partition, manifest audited,
    read_warc round-trips the full corpus byte-identically."""
    from htmpark.warc import write_warc_shards

    src = str(tmp_path / "src")
    write_warc(os.path.join(os.makedirs(src) or src, "all.warc"), PAGES)
    df = read_warc(spark, src).repartition(2, "url")
    out = str(tmp_path / "shards")
    manifest = write_warc_shards(df, out)
    assert sum(n for _, n, _ in manifest) == 3
    assert all(b > 0 for _, _, b in manifest)
    assert all(s.endswith(".warc.gz") for s, _, _ in manifest)

    back = {r.url: (r.warc_ts, bytes(r.html))
            for r in read_warc(spark, out).collect()}
    assert back == {r.url: (r.warc_ts, bytes(r.html))
                    for r in df.collect()}


def test_warc_round_trip_property(tmp_path):
    """Property: ANY byte body (including embedded CRLFCRLF, gzip magic,
    NULs) and any printable-ASCII url round-trips exactly through the
    writer + record parser, in both plain and gzip-member layouts —
    Content-Length framing means record content can never corrupt the
    grammar."""
    from hypothesis import given, settings, strategies as st

    url_st = st.text(
        alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E),
        min_size=1, max_size=50).map(lambda s: "https://h.example.com/" + s)
    body_st = st.binary(min_size=0, max_size=400)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(url_st, body_st), min_size=1, max_size=6),
           st.booleans())
    def check(recs, gz):
        pages = [(u, "2024-01-01T00:00:00Z", b) for u, b in recs]
        p = str(tmp_path / ("prop.warc.gz" if gz else "prop.warc"))
        write_warc(p, pages, gzip_members=gz)
        got = [(h["warc-target-uri"], http_payload(b))
               for h, b in iter_warc_records(open(p, "rb").read())]
        assert got == [(u, b) for u, b in recs]

    check()


WET_DOCS = [
    ("https://a.example.com/p/1", "2024-01-01T00:00:00Z",
     "one & done\nsecond line"),
    ("https://b.example.com/", "2024-01-02T12:30:45Z", "two"),
    # text with CRLFCRLF inside: Content-Length framing carries it;
    # non-ASCII exercises the UTF-8 encode/decode pair
    ("https://c.example.com/x?q=1", "2024-03-05T23:59:59Z",
     "drei ü vier\r\n\r\nfünf"),
]


@pytest.mark.parametrize("gz", [False, True])
def test_wet_round_trip(tmp_path, gz):
    """WET conversion records: text/plain block (no HTTP wrapper),
    deterministic md5-urn WARC-Refers-To, byte-exact text round trip."""
    import hashlib

    from htmpark.warc import write_wet

    p = str(tmp_path / ("t.warc.wet.gz" if gz else "t.warc.wet"))
    assert write_wet(p, WET_DOCS, gzip_members=gz) == 3
    raw = open(p, "rb").read()
    if gz:
        assert raw.startswith(b"\x1f\x8b")
    recs = list(iter_warc_records(raw))
    assert len(recs) == 3
    for (url, date_s, text), (hdr, body) in zip(WET_DOCS, recs):
        assert hdr["warc-type"] == "conversion"
        assert hdr["content-type"] == "text/plain"
        assert hdr["warc-target-uri"] == url
        assert hdr["warc-date"] == date_s
        assert hdr["warc-refers-to"] == \
            f"<urn:md5:{hashlib.md5(url.encode()).hexdigest()}>"
        # the block IS the text: no HTTP header strip on conversion
        assert body == text.encode("utf-8")


def test_wet_writer_is_deterministic(tmp_path):
    from htmpark.warc import write_wet

    a, b = str(tmp_path / "a.warc.wet.gz"), str(tmp_path / "b.warc.wet.gz")
    write_wet(a, WET_DOCS, gzip_members=True)
    write_wet(b, WET_DOCS, gzip_members=True)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_wet_surrogateescape_round_trip(tmp_path):
    """Undecodable payload bytes survive write->read via surrogateescape
    (the writer's encode is the exact inverse of the reader's decode)."""
    from htmpark.warc import write_wet

    text = b"raw \xff bytes".decode("utf-8", "surrogateescape")
    p = str(tmp_path / "s.warc.wet")
    write_wet(p, [("https://s.example.com/", "2024-01-01T00:00:00Z", text)])
    (hdr, body), = iter_warc_records(open(p, "rb").read())
    assert body == b"raw \xff bytes"
    assert body.decode("utf-8", "surrogateescape") == text


def test_write_wet_shards_round_trip(spark, tmp_path):
    """Distributed WET export: one .warc.wet.gz shard per partition,
    audited manifest, read_wet round-trips text + timestamps exactly and
    response-record readers ignore conversion shards (type filter)."""
    from htmpark.warc import read_wet, write_wet_shards

    df = spark.createDataFrame(
        [(u, datetime.datetime(2024, 1, 1), t) for u, _d, t in WET_DOCS],
        "url string, warc_ts timestamp_ntz, text string").repartition(2, "url")
    out = str(tmp_path / "wet_shards")
    manifest = write_wet_shards(df, out)
    assert sum(n for _, n, _ in manifest) == 3
    assert all(s.endswith(".warc.wet.gz") for s, _, _ in manifest)

    back = {r.url: (r.warc_ts, r.text)
            for r in read_wet(spark, out).collect()}
    assert back == {u: (datetime.datetime(2024, 1, 1), t)
                    for u, _d, t in WET_DOCS}


def test_read_wet_rotten_shard_sentinel(spark, tmp_path):
    """A WET shard with a rotten tail yields its readable prefix plus ONE
    text-NULL lineage sentinel row (shard_truncated = 1)."""
    from htmpark.warc import write_wet

    src = str(tmp_path / "rot")
    os.makedirs(src)
    p = os.path.join(src, "r.warc.wet")
    write_wet(p, WET_DOCS[:2])
    with open(p, "ab") as f:
        f.write(b"WARC/1.0\r\nWARC-Type: conversion\r\n"
                b"Content-Length: 999\r\n\r\ncut")
    from htmpark.warc import read_wet

    rows = read_wet(spark, src).collect()
    ok = [r for r in rows if r.shard_truncated == 0]
    bad = [r for r in rows if r.shard_truncated == 1]
    assert {r.url for r in ok} == {u for u, _d, _t in WET_DOCS[:2]}
    assert len(bad) == 1 and bad[0].text is None and bad[0].url is None


def test_wet_shards_reject_null_text(spark, tmp_path):
    """A NULL payload must fail LOUDLY in the export sink: str(None)
    would otherwise silently frame the 4-byte literal 'None' as a
    conversion record body (r9 review)."""
    from htmpark.warc import write_wet_shards

    df = spark.createDataFrame(
        [("https://a.example.com/", datetime.datetime(2024, 1, 1), None)],
        "url string, warc_ts timestamp_ntz, text string")
    with pytest.raises(Exception, match="NULL text"):
        write_wet_shards(df, str(tmp_path / "bad"))
