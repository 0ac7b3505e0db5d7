#!/usr/bin/env python3
"""spark-submit entry point for the extraction job (north-rule launch shape).

Cluster:
    cd /root/repo && zip -qr /tmp/htmpark.zip htmpark
    spark-submit --py-files /tmp/htmpark.zip job_main.py \
        --input s3://bucket/pages --output s3://bucket/extracted \
        --parts 4096 --salt 16

Local smoke:
    spark-submit --master 'local[8]' --py-files /tmp/htmpark.zip job_main.py \
        --synthesize 1000 --output /tmp/htmpark_out
"""
import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="path of (url, warc_ts, html, text, lang)")
    ap.add_argument("--input-format", default="parquet",
                    choices=["parquet", "orc", "json", "csv", "warc"],
                    help="source format; warc = Common-Crawl shard dir")
    ap.add_argument("--synthesize", type=int, default=0,
                    help="instead of --input, synthesize N deterministic pages")
    ap.add_argument("--output", required=True)
    ap.add_argument("--parts", type=int, default=64,
                    help="checkpoint partitions (scale with input size)")
    ap.add_argument("--salt", default="auto",
                    help="salt buckets for host skew: an int, 0 = no "
                         "repartition, or 'auto' (default) = decide from "
                         "parquet footer url statistics")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from htmpark.corpus import synthesize_pages
    from htmpark.job import build_session, read_table, run_extraction

    salt = args.salt if args.salt == "auto" else int(args.salt)
    spark = build_session()  # master comes from spark-submit
    spark.sparkContext.setLogLevel("WARN")
    if args.synthesize:
        df = synthesize_pages(spark, args.synthesize)
    else:
        df = read_table(spark, args.input, fmt=args.input_format)
    res = run_extraction(spark, df, args.output, num_parts=args.parts,
                         salt_buckets=salt, resume=not args.no_resume)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
