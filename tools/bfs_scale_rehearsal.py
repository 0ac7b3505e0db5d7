#!/usr/bin/env python3
"""Scale rehearsal of the shared crawl-BFS loop (queries._bfs_waves).

The PLANS.md audit of the seeded-BFS dist join promises that past the
broadcast threshold the per-wave frontier-vs-edges join stops
broadcasting and shuffles co-keyed on host, with per-wave cost flat in
hosts — demonstrated in-repo only at _BFS_HOSTS=96 (the oracle-gate
graph).  This tool is the evidence run (r9 verdict item 5): it
synthesizes a doubling-map host graph at a caller-chosen host count
(default 10^5), runs the SAME _bfs_waves loop the production queries
use (shared code, not a reimplementation), and reports

  * per-wave frontier size + wall seconds (via the loop's wave_probe
    diagnostics hook),
  * the executed join regime of a saturated wave (BroadcastHashJoin vs
    shuffle-keyed SortMergeJoin/ShuffledHashJoin),
  * a full distance check against a driver-side pure-Python BFS oracle
    (exact per-host compare below --exact-limit hosts, per-wave
    histogram compare above it — the histogram pins wave count and
    every wave's cardinality, so a wrong distance cannot hide).

Graph: src in [0, H), dst = (2*src + b) mod H for b in {0,1,2} —
3H distinct edges, every host reachable from seed 0, diameter
~log2(H), so the frontier saturates to ~H within ~17 waves at 10^5.
Built exactly like queries._bfs_edges (distinct, repartition(src),
persist, count with AQE on) so the loop sees the same static-edge
shape the production queries pin.

Usage:
  python tools/bfs_scale_rehearsal.py [--hosts 100000] [--cpus 32]
      [--exact-limit 200000] [--plan]

Prints one JSON line (machine-readable record for PLANS.md) plus,
with --plan, the saturated wave's executed plan.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import Counter, deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def python_bfs(hosts: int) -> dict:
    """Driver-side oracle: BFS distance from host 0 over the doubling
    map dst = (2*src + b) % hosts, b in {0,1,2}."""
    dist = {0: 0}
    q = deque([0])
    while q:
        s = q.popleft()
        for b in (0, 1, 2):
            d = (2 * s + b) % hosts
            if d not in dist:
                dist[d] = dist[s] + 1
                q.append(d)
    return dist


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--exact-limit", type=int, default=200_000,
                    help="exact per-host oracle compare up to this many "
                         "hosts; per-wave histogram compare above it")
    ap.add_argument("--plan", action="store_true",
                    help="print the saturated wave's executed plan")
    args = ap.parse_args()
    H = args.hosts

    from pyspark.sql import SparkSession, functions as F

    import htmpark.queries as Q

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("bfs-scale-rehearsal")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # static edge table, built like queries._bfs_edges: distinct,
    # pre-partitioned on src, persisted ONCE with AQE still on
    edges = (spark.range(H)
             .selectExpr("explode(array(0, 1, 2)) AS b", "id")
             .selectExpr("CAST(id AS INT) AS src",
                         f"CAST((2 * id + b) % {H} AS INT) AS dst")
             .distinct()
             .repartition(F.col("src")).persist())
    n_edges = edges.count()

    seeds = spark.createDataFrame([(0, 0)], "host int, wave int")
    per_wave = []
    plans = {}
    t_state = {"last": time.monotonic()}

    def probe(wave, n, joined):
        dt = time.monotonic() - t_state["last"]
        per_wave.append({"wave": wave, "rows": n,
                         "sec": round(dt, 3)})
        # capture the plan once the frontier saturates (largest wave
        # joins are where the regime matters)
        plans[wave] = joined._jdf.queryExecution().executedPlan().toString()
        t_state["last"] = time.monotonic()

    t0 = time.monotonic()
    dist = Q._bfs_waves(spark, edges, seeds, max_waves=4 * H.bit_length(),
                        wave_probe=probe)
    dist = dist.persist()
    total_reached = dist.count()
    wall = time.monotonic() - t0

    # oracle check
    oracle = python_bfs(H)
    hist_spark = {int(r["wave"]): int(r["n"]) for r in
                  dist.groupBy("wave").agg(F.count("*").alias("n"))
                  .collect()}
    hist_oracle = dict(Counter(oracle.values()))
    hist_ok = hist_spark == hist_oracle
    exact_ok = None
    if H <= args.exact_limit:
        got = {int(r["host"]): int(r["wave"]) for r in dist.collect()}
        exact_ok = got == oracle

    # join regime of the saturated (largest-frontier) wave: the wave
    # plan holds two joins (frontier-vs-edges inner + visited anti);
    # report every strategy present — "shuffle" means at least one
    # join left the broadcast regime and keyed an exchange on host
    big_wave = max(per_wave, key=lambda r: r["rows"])["wave"]
    plan = plans[big_wave]
    strategies = sorted(s for s in
                        ("BroadcastHashJoin", "SortMergeJoin",
                         "ShuffledHashJoin", "BroadcastNestedLoopJoin")
                        if s in plan)
    regime = ("shuffle" if ("SortMergeJoin" in plan
                            or "ShuffledHashJoin" in plan)
              else "broadcast")
    # per-wave flatness after saturation: max/min wall-sec over waves
    # whose frontier is within 2x of the largest (excludes ramp-up)
    big_rows = max(r["rows"] for r in per_wave)
    sat = [r["sec"] for r in per_wave if r["rows"] * 2 >= big_rows]
    flat_ratio = round(max(sat) / min(sat), 2) if len(sat) > 1 else None

    out = {
        "hosts": H, "edges": n_edges, "cpus": args.cpus,
        "waves": len(per_wave), "reached": total_reached,
        "wall_sec": round(wall, 2),
        "oracle_hist_match": hist_ok, "oracle_exact_match": exact_ok,
        "saturated_wave_regime": regime,
        "saturated_wave_join_strategies": strategies,
        "saturated_flat_ratio_maxmin": flat_ratio,
        "per_wave": per_wave,
    }
    print(json.dumps(out))
    if args.plan:
        print(f"--- executed plan, wave {big_wave} "
              f"({big_rows} frontier rows) ---", file=sys.stderr)
        print(plan, file=sys.stderr)
    spark.stop()
    return 0 if hist_ok and exact_ok is not False else 1


if __name__ == "__main__":
    raise SystemExit(main())
