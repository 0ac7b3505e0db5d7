#!/usr/bin/env python3
"""WARC end-to-end soak: the 1M-page corpus THROUGH the archive format.

The parquet soak (BENCH/BASELINE.md) proves the parse pipeline; this one
proves the WARC leg at the same scale: synthesize 1M pages, export them
as gzip-member WARC shards (write_warc_shards), then run the real crawl
ingest path — binaryFile scan -> streamed record split (read_warc) ->
extract_pages — and checksum the extracted text.  Two timed passes pin
determinism (bit-identical checksums) and steady-state throughput.

Run pinned, nothing else on the host (see the bench-method rules):
    taskset -c 0-31 python BENCH/warc_soak.py [n_pages] [body_repeat]

``body_repeat`` (default 12 -> ~2.6 KB/page, the bench corpus shape)
tiles the body fragment; ~500 gives the ~50 KB/page Common-Crawl-record
shape, where gunzip + record framing are a larger share of the ingest
cost than at bench size (r6 verdict item 5).
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from htmpark.corpus import synthesize_pages  # noqa: E402
from htmpark.job import build_session, extract_pages  # noqa: E402
from htmpark.warc import read_warc, write_warc_shards  # noqa: E402

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
BODY_REPEAT = int(sys.argv[2]) if len(sys.argv) > 2 else 12
N_SHARDS = 64  # >= 2x cores: one binaryFile task per shard


def checksum_run(spark, shard_dir):
    """One full ingest pass: WARC scan -> streamed split -> parse ->
    order-insensitive checksum (bit_xor per the ANSI-overflow note)."""
    pages = read_warc(spark, shard_dir).where(F.col("html").isNotNull())
    out = extract_pages(pages.select("url", "warc_ts", "html", "lang"),
                        salt_buckets=0)
    row = (out.agg(F.count("*").alias("n"),
                   F.sum(F.col("parse_ok").cast("long")).alias("n_ok"),
                   F.bit_xor(F.xxhash64("url", "text")).alias("chk"))
           .first())
    return row.n, row.n_ok, row.chk


def main():
    spark = build_session("local[32]", shuffle_partitions=64,
                          app_name="htmpark-warc-soak")
    spark.sparkContext.setLogLevel("ERROR")

    shard_dir = tempfile.mkdtemp(prefix="htmpark_warc_soak_")
    try:
        t0 = time.time()
        pages = (synthesize_pages(spark, N_PAGES, body_repeat=BODY_REPEAT)
                 .repartition(N_SHARDS))
        manifest = write_warc_shards(pages, shard_dir)
        t_export = time.time() - t0
        n_rec = sum(n for _, n, _ in manifest)
        gz_bytes = sum(b for _, _, b in manifest)
        print(f"export: {len(manifest)} shards, {n_rec} records, "
              f"{gz_bytes / 1e6:.0f} MB gzip in {t_export:.1f}s "
              f"({n_rec / t_export:.0f} pages/s)")

        # warm pass (JVM codegen, python workers, page cache), untimed;
        # page-size stat measured here so the timed pass stays the exact
        # r6 shape (count/sum/bit_xor agg only)
        checksum_run(spark, shard_dir)
        html_bytes = (read_warc(spark, shard_dir)
                      .where(F.col("html").isNotNull())
                      .agg(F.sum(F.octet_length("html"))).first()[0])

        results = []
        for i in range(2):
            t0 = time.time()
            n, n_ok, chk = checksum_run(spark, shard_dir)
            dt = time.time() - t0
            results.append((n, n_ok, chk, dt))
            print(f"pass {i}: {n} pages, {n_ok} ok, checksum {chk} "
                  f"in {dt:.1f}s ({n / dt:.0f} pages/s, "
                  f"{html_bytes / dt / 1e6:.1f} MB/s decompressed, "
                  f"{html_bytes / n:.0f} B/page)")

        assert results[0][:3] == results[1][:3], "nondeterministic!"
        assert results[0][0] == N_PAGES and results[0][1] == N_PAGES
        best = max(r[0] / r[3] for r in results)
        print(f"RESULT warc_ingest {N_PAGES} pages x "
              f"{html_bytes / n:.0f} B, "
              f"best {best:.0f} pages/s, checksums identical x2")
    finally:
        shutil.rmtree(shard_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
