#!/usr/bin/env python3
"""Isolated steady-state re-measure of individual registry queries.

The bench-method rule (BENCH/BASELINE.md, memory notes): a suspected
per-query mover in a closing/driver bench is settled ONLY by an
isolated steady-state re-measure — same session shape as bench.py
(local[32], shuffle partitions 32, identical warmups), nothing else
running on the host, three timed reps per query after the memo
dependencies are built untimed.  Each rep is comparable to one
driver-bench reading: both run the query in a fully warm session.

Usage:
    python BENCH/remeasure_query.py graph_pagerank stream_click_attribution

Prints one JSON line: {"sf_dir": ..., "cpus": ..., "reps": {name: [s,s,s]}}
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(names):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from BENCH.bench_common import noop_materialize as materialize
    from BENCH.bench_common import warm_session
    from htmpark.job import build_session
    from htmpark.queries import REGISTRY, candidate_pairs, q_dedup_clusters

    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"not in REGISTRY: {unknown}")

    spark = build_session(f"local[{cpus}]", shuffle_partitions=max(cpus, 32),
                          app_name="htmpark-remeasure")
    spark.sparkContext.setLogLevel("ERROR")

    # the IDENTICAL warmup sequence bench.py runs (shared helper —
    # comparability is the whole point).  Measured queries are NOT
    # excluded (r11 ADVICE): bench.py warm-runs registry-head entries
    # untimed before timing them, so a head entry's driver-comparable
    # reading is plan-warm — excluding it here made rep 0 read cold-plan
    # and a re-measure could fail to settle a mover it should settle.
    warm_session(spark, sf_dir)
    # memo dependencies built UNTIMED, exactly as the driver bench times
    # them on their own attribution lines before the per-query loop
    candidate_pairs(spark, sf_dir)
    materialize(q_dedup_clusters(spark, sf_dir))

    reps = {}
    for name in names:
        fn = REGISTRY[name][0]
        ts = []
        for _ in range(3):
            t0 = time.time()
            materialize(fn(spark, sf_dir))
            ts.append(round(time.time() - t0, 3))
        reps[name] = ts

    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "reps": reps}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:] or ["graph_pagerank", "stream_click_attribution"])
