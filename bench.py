#!/usr/bin/env python3
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "e2e_bench_seconds", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>,
   "pages_per_sec": <extraction throughput on the synthetic web corpus>}

Every query is materialized through the noop sink (all columns computed,
nothing collected to the driver).  The extraction headline parses a
deterministic ~2.3KB/page synthetic web corpus sized to the SF.
"""
import json
import os
import sys
import time


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from BENCH.bench_common import noop_materialize as materialize
    from BENCH.bench_common import warm_session
    from htmpark.corpus import synthesize_pages
    from htmpark.job import build_session, extract_pages
    from htmpark.queries import REGISTRY, candidate_pairs, q_dedup_clusters

    spark = build_session(f"local[{cpus}]", shuffle_partitions=max(cpus, 32),
                          app_name="htmpark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # untimed steady-state warmups — the full sequence (worker spawn +
    # codegen, table footers/page cache, shuffle/window machinery, and
    # the head-of-line residual leveller) lives in BENCH/bench_common.py
    # so the isolated re-measure harness runs the IDENTICAL session
    # shape (the r4/r11 history of why each block exists is documented
    # there)
    warm_session(spark, sf_dir)

    timings = {}

    # The dedup family (pairs/clusters/pagerank/curation) shares ONE
    # persisted candidate-pair materialization per session (the in-session
    # analogue of writing `pairs` once and fanning out).  Time that
    # one-time build as its own line item so it stops being attributed to
    # whichever family query the registry order happens to run first
    # (round 3 it landed on dedup_minhash_pairs and read as a 2.4x
    # regression).  It still counts toward the suite total.
    t0 = time.time()
    candidate_pairs(spark, sf_dir)  # persist + eager count inside
    timings["dedup_family_memo"] = round(time.time() - t0, 3)

    # same treatment for the cluster-labels fixpoint: q_dedup_clusters
    # memoizes the persisted label table, so whichever family consumer the
    # registry order puts first would otherwise absorb the whole CC cost
    # (r5 reorder: curation_pipeline ran before dedup_clusters and read as
    # a 6x regression that was really this memo build)
    t0 = time.time()
    materialize(q_dedup_clusters(spark, sf_dir))
    timings["dedup_labels_memo"] = round(time.time() - t0, 3)

    # headline: synthetic web-corpus extraction, sized to SF
    n_pages = max(2000, int(200_000 * sf))
    corpus = synthesize_pages(spark, n_pages, body_repeat=12)
    t0 = time.time()
    materialize(extract_pages(corpus, salt_buckets=8, num_partitions=cpus * 2))
    dt = time.time() - t0
    timings["extract_corpus"] = round(dt, 3)
    pages_per_sec = round(n_pages / dt, 1)

    for name, (fn, _sql) in REGISTRY.items():
        t0 = time.time()
        materialize(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "e2e_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pages_per_sec": pages_per_sec,
        "bench_pages": n_pages,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
