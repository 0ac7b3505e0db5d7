"""Structured Streaming facade: stream output == batch output."""
import os

from pyspark.sql import functions as F

from htmpark.corpus import synthesize_pages
from htmpark.job import extract_pages
from htmpark.streaming import (extract_pages_stream, run_windowed_events_stream,
                               windowed_event_counts)

SF = "/root/testdata/sf0.001"


def test_stream_extraction_equals_batch(spark, tmp_out):
    src = os.path.join(tmp_out, "src")
    out = os.path.join(tmp_out, "out")
    ckpt = os.path.join(tmp_out, "ckpt")
    df = synthesize_pages(spark, 300)
    df.write.parquet(src)

    q = extract_pages_stream(spark, src, out, ckpt)
    q.awaitTermination(240)

    streamed = {r.url: r.text for r in spark.read.parquet(out).collect()}
    batch = {r.url: r.text
             for r in extract_pages(spark.read.parquet(src), salt_buckets=0).collect()}
    assert streamed == batch
    assert len(streamed) == 300

    # restart with the same checkpoint: no new files -> no duplicate rows
    q2 = extract_pages_stream(spark, src, out, ckpt)
    q2.awaitTermination(240)
    assert spark.read.parquet(out).count() == 300


def test_windowed_events_stream_matches_batch(spark, tmp_out):
    import shutil

    src = os.path.join(tmp_out, "ev_src")   # file source needs a DIRECTORY
    os.makedirs(src)
    shutil.copy(f"{SF}/events.parquet", src)
    out = os.path.join(tmp_out, "ev_out")
    ckpt = os.path.join(tmp_out, "ev_ckpt")
    q = run_windowed_events_stream(spark, src, out, ckpt)
    q.awaitTermination(240)

    streamed = spark.read.parquet(out)
    batch = windowed_event_counts(spark.read.parquet(src))
    sm = {(r.win_start, r.event_type): (r.n_events, r.value_cents)
          for r in streamed.collect()}
    bm = {(r.win_start, r.event_type): (r.n_events, r.value_cents)
          for r in batch.collect()}
    # append mode emits a window only once the watermark passes it: every
    # emitted window must match batch exactly; only trailing windows still
    # inside the watermark delay may be withheld at stream end
    assert set(sm) <= set(bm)
    assert all(sm[k] == bm[k] for k in sm)
    held = set(bm) - set(sm)
    max_start = max(k[0] for k in bm)
    import datetime
    assert all(k[0] >= max_start - datetime.timedelta(minutes=6) for k in held)
    assert len(sm) > 100
