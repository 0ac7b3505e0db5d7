#!/usr/bin/env python3
"""Salted-shuffle cost attribution at 32 cores (round-4 VERDICT item 5).

BENCH/BASELINE.md shows the salted extraction plan (scan -> repartition on
salted host -> mapInPandas parse) paying 30-50% of wall-clock vs the
unsalted plan at 32 cores.  The shuffle moves the raw html BYTES (the parse
input, KBs per row), so the candidate levers are shuffle I/O levers:

  * io codec (lz4 default vs zstd — html compresses 3-5x, less disk I/O
    for more CPU),
  * shuffle file buffer (32k default vs 1m — fewer write syscalls),
  * Arrow batch size for the parse stage (2048 default vs 8192),
  * tmpfs spark.local.dir (/dev/shm) — NOT a production setting; it is the
    attribution probe: if memory-backed shuffle closes the gap, the floor
    is this sandbox's /tmp disk, not the engine.

Each variant = fresh JVM subprocess pinned to the same cores (taskset),
one untimed warmup pass, then timed unsalted + salted passes over the same
pre-written parquet corpus (the run_scaling.py fairness rules).  Run it
with nothing else on the host.

Usage:
    python BENCH/tune_shuffle.py                 # all variants at 32 cores
    python BENCH/tune_shuffle.py --variant zstd --cores 32 --input DIR
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGE_BODY_REPEAT = 40  # ~4.3KB tag-dense pages (run_scaling.py corpus)

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "zstd": {"spark.io.compression.codec": "zstd"},
    "bigbuf": {"spark.shuffle.file.buffer": "1m",
               "spark.shuffle.spill.diskWriteBufferSize": "1m"},
    "zstd+bigbuf": {"spark.io.compression.codec": "zstd",
                    "spark.shuffle.file.buffer": "1m",
                    "spark.shuffle.spill.diskWriteBufferSize": "1m"},
    "arrow8k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "8192"},
    "nocompress": {"spark.shuffle.compress": "false"},
    "tmpfs": {"spark.local.dir": "/dev/shm/htmpark_shuffle"},
}


def run_variant(variant: str, cores: int, input_path: str,
                repeats: int = 3) -> dict:
    sys.path.insert(0, REPO)
    from htmpark.job import build_session, extract_pages

    conf = dict(VARIANTS[variant])
    if conf.get("spark.local.dir", "").startswith("/dev/shm"):
        os.makedirs(conf["spark.local.dir"], exist_ok=True)
    spark = build_session(f"local[{cores}]", shuffle_partitions=cores * 2,
                          app_name=f"htmpark-tune-{variant}", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    corpus = spark.read.parquet(input_path)
    n = corpus.count()
    # untimed warmup: python workers, codegen, page cache
    materialize(extract_pages(corpus, salt_buckets=0))
    # repeats interleaved (plain, salted, plain, salted, ...) so the host's
    # turbo drift hits both plans equally; report the per-plan MEDIAN
    plains, salteds = [], []
    for _ in range(repeats):
        t0 = time.time()
        materialize(extract_pages(corpus, salt_buckets=0))
        plains.append(time.time() - t0)
        t0 = time.time()
        materialize(extract_pages(corpus, salt_buckets=8,
                                  num_partitions=cores * 3))
        salteds.append(time.time() - t0)
    spark.stop()
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    dt_plain, dt_salted = med(plains), med(salteds)
    return {
        "variant": variant,
        "cores": cores,
        "pages": n,
        "plain_pps": round(n / dt_plain, 1),
        "salted_pps": round(n / dt_salted, 1),
        "salted_over_plain": round(dt_plain / dt_salted, 3),
        "plain_runs": [round(x, 2) for x in plains],
        "salted_runs": [round(x, 2) for x in salteds],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--input")
    ap.add_argument("--pages", type=int, default=60000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    if args.variant:
        print(json.dumps(run_variant(args.variant, args.cores, args.input,
                                     args.repeats)))
        return

    sys.path.insert(0, REPO)
    from htmpark.corpus import synthesize_pages
    from htmpark.job import build_session

    tmp = tempfile.mkdtemp(prefix="htmpark_tune_")
    corpus_path = os.path.join(tmp, "corpus")
    spark = build_session("local[32]", app_name="htmpark-tune-gen")
    spark.sparkContext.setLogLevel("ERROR")
    synthesize_pages(spark, args.pages, partitions=96,
                     body_repeat=PAGE_BODY_REPEAT).write.parquet(corpus_path)
    spark.stop()

    for variant in args.variants.split(","):
        cmd = ["taskset", "-c", f"0-{args.cores - 1}", sys.executable,
               os.path.abspath(__file__), "--variant", variant,
               "--cores", str(args.cores), "--input", corpus_path,
               "--repeats", str(args.repeats)]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                             check=True)
        print(out.stdout.strip().splitlines()[-1], flush=True)


if __name__ == "__main__":
    main()
