"""Deterministic synthetic web-page corpus (FIXTURES.md §1).

The engine's input shape per BASELINE.json input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Every column is a pure function of the row index — no RNG — so the corpus
is identical at any parallelism level and any scale.  Generation runs
entirely JVM-side (Catalyst expressions over ``spark.range``): no Python is
involved, so synthesizing even 10^8 rows is shuffle-free and embarrassingly
parallel — exactly how a 100 TB input table would be laid down.

host000 owns 20% of rows (i % 5 == 0) to exercise the salted-repartition
skew path; the remaining rows spread over 97 hosts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Body fragments cycled by row index.  A mix of realistic page bodies and
# quirk-ledger shapes so the corpus continuously re-checks parser behavior.
# {i} is interpolated per row so every page is unique.
FRAGMENTS = [
    "<h1>Article {i}</h1><p>Plain paragraph body for row {i} with enough "
    "words to look like prose.</p><p>Second paragraph &amp; entities "
    "&lt;here&gt;.</p>",
    "<nav><a href=/a>home</a> <a href=/b>about</a></nav><article><h2>Post "
    "{i}</h2><p>Content of post {i} continues with more text.</p></article>"
    "<footer><a href=/c>contact</a></footer>",
    "<table><tr><td>cell {i}</td><td>other</td></tr>b{i}</table>after",
    "<ul><li>first {i}<li>second<li>third</ul><p>&notin; quirk and &#65; "
    "digit ref</p>",
    "<pre>  raw\n  spacing {i}  </pre><p>x &amp y</p>",
    "<script>var x = 1 < 2 && 'skip {i}';</script><p>visible {i}</p>"
    "<style>p {{ color: red }}</style>",
    "<div><b><i>nested {i}</b>broken</i> markup</div><p>tail</p>",
    "<svg viewbox=\"0 0 1 1\"><circle r=\"1\"/>svg text {i}</svg><p>after "
    "svg</p>",
    "<textarea>area &lt;{i}&gt;</textarea><h3>Head</h3><p>closing body "
    "text</p>",
    "<p>unicode éü—{i} and <a href=x>inline link</a> "
    "mixed</p>",
]

LANGS = ["en", "de", "fr", "es", "pt", "zh"]


def page_html_expr(i_col, body_repeat: int = 1):
    """Catalyst expression assembling the page for row index ``i_col``.

    ``body_repeat`` tiles the body fragment to reach realistic page sizes
    (~2-4 KB at 12x) for throughput benchmarks; correctness fixtures use 1.
    """
    frags = F.array(*[F.lit(f) for f in FRAGMENTS])
    body = F.element_at(frags, (i_col % len(FRAGMENTS) + 1).cast("int"))
    body = F.replace(body, F.lit("{i}"), i_col.cast("string"))
    if body_repeat > 1:
        body = F.repeat(body, body_repeat)
    return F.concat(
        F.lit("<!DOCTYPE html><html><head><title>T"),
        i_col.cast("string"),
        F.lit("</title></head><body>"),
        body,
        F.lit("</body></html>"),
    )


def synthesize_pages(spark: SparkSession, n_rows: int, partitions: int | None = None,
                     body_repeat: int = 1) -> DataFrame:
    """Deterministic (url, warc_ts, html, text, lang) table of n_rows pages."""
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    host = F.when(i % 5 == 0, F.lit(0)).otherwise((i % 97) + 1)
    url = F.concat(
        F.lit("https://host"),
        F.lpad(host.cast("string"), 3, "0"),
        F.lit(".example.com/p/"),
        i.cast("string"),
    )
    return df.select(
        url.alias("url"),
        (F.lit("2025-01-01 00:00:00").cast("timestamp")
         + F.make_dt_interval(secs=i.cast("double"))).alias("warc_ts"),
        F.encode(page_html_expr(i, body_repeat), "UTF-8").alias("html"),
        F.lit("").alias("text"),
        F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                     (i % len(LANGS) + 1).cast("int")).alias("lang"),
    )


def write_corpus(spark: SparkSession, path: str, n_rows: int) -> None:
    synthesize_pages(spark, n_rows).write.mode("overwrite").parquet(path)
