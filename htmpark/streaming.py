"""Structured Streaming facade over the same extraction core.

The north rule asks for a resumable BATCH job (htmpark.job delivers that);
this module additionally exposes the engine through Structured Streaming for
pipelines that tail a landing zone of page files:

* ``extract_pages_stream`` — readStream(parquet dir) -> the same vectorized
  mapInPandas parse -> parquet sink with checkpointing.  Stateless, so it
  scales exactly like the batch plan; exactly-once via the stream
  checkpoint + file sink log.
* ``windowed_event_counts`` — the watermark + tumbling-window aggregation
  shape over an events stream (late data bounded by the watermark).

Both are exercised with trigger(availableNow=True) in tests, which is also
the production backfill pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .job import OUTPUT_SCHEMA, _parse_batches

CORPUS_DDL = ("url string, warc_ts timestamp, html binary, text string, "
              "lang string")


def extract_pages_stream(spark: SparkSession, input_path: str,
                         output_path: str, checkpoint_path: str,
                         trigger_available_now: bool = True):
    """Stream page files through the extraction core.  Returns the query."""
    sdf = (spark.readStream.schema(CORPUS_DDL)
           .option("maxFilesPerTrigger", "64")
           .parquet(input_path)
           .select("url", "warc_ts", "html", "lang"))
    out = sdf.mapInPandas(_parse_batches, OUTPUT_SCHEMA)
    writer = (out.writeStream.format("parquet")
              .option("path", output_path)
              .option("checkpointLocation", checkpoint_path)
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(events: DataFrame, window: str = "1 minute",
                          watermark: str = "5 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregation (streaming-safe plan)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"),
             F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"))
        .select(F.col("win.start").alias("win_start"), "event_type",
                "n_events", "value_cents")
    )


def run_windowed_events_stream(spark: SparkSession, input_path: str,
                               output_path: str, checkpoint_path: str):
    """readStream(events parquet) -> watermark+window agg -> parquet sink."""
    sdf = (spark.readStream
           .schema("event_id long, ts timestamp, user_id long, "
                   "event_type string, value double, props string")
           .parquet(input_path))
    agg = windowed_event_counts(sdf)
    return (agg.writeStream.format("parquet")
            .option("path", output_path)
            .option("checkpointLocation", checkpoint_path)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
