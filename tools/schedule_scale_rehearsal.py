#!/usr/bin/env python3
"""Scale rehearsal of the budget-paced crawl schedule + carryover
cycles (queries._schedule_wave_split / next_schedule_cycle).

PLANS.md's schedule audit promises: the planning join is ONE host-key
equi-join (broadcast only while the host dim is bounded), the per-host
wave split is array-local (bounded by the planning horizon, never by
the host's total demand), and the carryover consumer is one host-keyed
max_by partial agg + the same split — nothing proportional to anything
but hosts ever reaches the driver.  Demonstrated in-repo only at the
oracle gate's ~100 hosts; this tool is the evidence run (r10 verdict
item 5: the schedule was the last crawl op without a measured scale
run).  It synthesizes a (host, wave) discovery table and a (host,
allowed, cap) budget table at a caller-chosen host count, runs the
SAME production split + consumer (shared code, not a reimplementation)
for a fixed number of planning cycles with each cycle persisted (the
production planner's table-per-cycle pattern), and reports

  * per-cycle rows, fetched totals, carryover hosts + wall seconds,
  * the executed join/agg regime of cycle 1 (planning join) and of a
    consumer cycle (max_by agg exchange),
  * an exactness check against a driver-side closed-form oracle:
    below --exact-limit hosts every (host, wave, n_fetched, carryover)
    row is compared; above it the per-cycle row counts and fetched
    totals are compared against the exact integer closed forms
    (min(ceil(a/c), k*h) waves, min(a, m*c) fetched — a wrong spill or
    a double-counted handoff cannot satisfy both at 10^6 hosts).

Inputs are synthesized deterministically: wave = host % 24 (bounded
discovery depths), allowed = (host * 7919) % 200 with every 11th host
zero-allowed (the schedules-nothing path), cap drawn from the gate's
own delay-derived set {12, 30, 6, 60} by host % 4.

Usage:
  python tools/schedule_scale_rehearsal.py [--hosts 1000000]
      [--cpus 32] [--horizon 8] [--cycles 4] [--exact-limit 200000]
      [--plan]

Prints one JSON line (machine-readable record for PLANS.md) plus,
with --plan, the cycle-1 and consumer executed plans.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPS = (12, 30, 6, 60)  # the gate's delay-derived token caps


def host_params(h: int) -> tuple:
    """(wave0, allowed, cap) for host h — the synthesis formulas."""
    allowed = 0 if h % 11 == 0 else (h * 7919) % 200
    return h % 24, allowed, CAPS[h % 4]


def closed_form(H: int, horizon: int, cycles: int) -> dict:
    """Exact per-cycle totals from the integer closed forms."""
    rows = [0] * cycles
    fetched = [0] * cycles
    carry_hosts = [0] * cycles
    for h in range(H):
        _, a, c = host_params(h)
        if a <= 0:
            continue
        n_w = (a + c - 1) // c
        for k in range(cycles):
            m0, m1 = min(n_w, k * horizon), min(n_w, (k + 1) * horizon)
            rows[k] += m1 - m0
            fetched[k] += min(a, m1 * c) - min(a, m0 * c)
            if m1 < n_w:
                carry_hosts[k] += 1
    return {"rows": rows, "fetched": fetched, "carry_hosts": carry_hosts}


def expected_rows(H: int, horizon: int, cycles: int) -> dict:
    """{(host, wave): (n_fetched, carryover, cap)} below --exact-limit."""
    out = {}
    for h in range(H):
        w0, a, c = host_params(h)
        if a <= 0:
            continue
        n_w = (a + c - 1) // c
        for k in range(min(n_w, cycles * horizon)):
            out[(h, w0 + k)] = (min(c, a - k * c),
                                max(0, a - (k + 1) * c), c)
    return out


def join_strategies(plan: str) -> list:
    return sorted(s for s in ("BroadcastHashJoin", "SortMergeJoin",
                              "ShuffledHashJoin", "BroadcastNestedLoopJoin")
                  if s in plan)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--horizon", type=int, default=8)
    ap.add_argument("--cycles", type=int, default=4)
    ap.add_argument("--exact-limit", type=int, default=200_000)
    ap.add_argument("--plan", action="store_true")
    args = ap.parse_args()
    H, hz, K = args.hosts, args.horizon, args.cycles

    from pyspark import StorageLevel
    from pyspark.sql import SparkSession, functions as F

    import htmpark.queries as Q

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("schedule-scale-rehearsal")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.ui.enabled", "false")
             # local-mode heap holds the persisted cycle tables AND any
             # AQE-elected broadcast of the budget dim: the default 1g
             # OOMs around 10^7 hosts, well before the data is large by
             # cluster standards
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # discovery + budget dims, co-synthesized but joined THROUGH the
    # production shape: two independent keyed tables meeting in one
    # host equi-join (exactly q_web_crawl_schedule's dist-vs-budget)
    dist = (spark.range(H)
            .selectExpr("CAST(id AS INT) AS host",
                        "CAST(id % 24 AS INT) AS wave"))
    budget = (spark.range(H)
              .selectExpr("CAST(id AS INT) AS host_num",
                          "CAST(CASE WHEN id % 11 = 0 THEN 0 "
                          "ELSE (id * 7919) % 200 END AS BIGINT) AS allowed",
                          f"CAST(element_at(array{CAPS}, "
                          "CAST(id % 4 AS INT) + 1) AS BIGINT) AS cap"))

    j = (dist.join(budget, dist["host"] == budget["host_num"])
         .where(F.col("allowed") > 0)
         .select("host", "wave", "allowed", "cap"))

    per_cycle = []
    plans = {}
    t0 = time.monotonic()
    cur = Q._schedule_wave_split(j, hz).persist(StorageLevel.MEMORY_AND_DISK)
    for k in range(K):
        tc = time.monotonic()
        agg = cur.agg(
            F.count("*").alias("rows"),
            F.sum("n_fetched").alias("fetched")).collect()[0]
        # a host is STILL TRUNCATED after this cycle iff its last
        # emitted wave carries over — carryover strictly decreases per
        # wave, so that is min(carryover) > 0 over the host's rows
        carry_hosts = (cur.groupBy("host")
                       .agg(F.min("carryover").alias("mc"))
                       .where(F.col("mc") > 0).count())
        plans[k] = cur._jdf.queryExecution().executedPlan().toString()
        per_cycle.append({"cycle": k + 1, "rows": int(agg["rows"]),
                          "fetched": int(agg["fetched"]),
                          "carry_hosts": int(carry_hosts),
                          "sec": round(time.monotonic() - tc, 3)})
        if k + 1 < K:
            nxt = (Q.next_schedule_cycle(cur, hz)
                   .persist(StorageLevel.MEMORY_AND_DISK))
            nxt.count()
            cur.unpersist()
            cur = nxt
    wall = time.monotonic() - t0

    # exactness vs the closed forms
    cf = closed_form(H, hz, K)
    totals_ok = (cf["rows"] == [r["rows"] for r in per_cycle]
                 and cf["fetched"] == [r["fetched"] for r in per_cycle])
    # carry_hosts: a host still carrying after cycle k
    carry_ok = cf["carry_hosts"] == [r["carry_hosts"] for r in per_cycle]
    exact_ok = None
    if H <= args.exact_limit:
        want = expected_rows(H, hz, K)
        got = {}
        cyc = Q._schedule_wave_split(j, hz)
        for k in range(K):
            for r in cyc.collect():
                got[(r.host, r.wave)] = (r.n_fetched, r.carryover, r.cap)
            cyc = Q.next_schedule_cycle(cyc, hz)
        exact_ok = got == want

    plan1, planK = plans[0], plans[K - 1]
    # flatness over the CONSUMER cycles (2..K): cycle 1 additionally
    # pays the planning join, first materialization, and codegen
    sat = [r["sec"] for r in per_cycle[1:]] or [per_cycle[0]["sec"]]
    out = {
        "hosts": H, "cpus": args.cpus, "horizon": hz, "cycles": K,
        "wall_sec": round(wall, 2),
        "totals_match_closed_form": totals_ok,
        "carry_hosts_match": carry_ok,
        "exact_rows_match": exact_ok,
        "cycle1_join_strategies": join_strategies(plan1),
        "consumer_join_strategies": join_strategies(planK),
        "consumer_has_partial_maxby": "partial_max_by" in planK
                                      or "max_by" in planK,
        "consumer_sec_maxmin": round(max(sat) / min(sat), 2),
        "per_cycle": per_cycle,
    }
    print(json.dumps(out))
    if args.plan:
        print("--- cycle 1 (planning join + split) ---", file=sys.stderr)
        print(plan1, file=sys.stderr)
        print(f"--- cycle {K} (consumer max_by + split) ---",
              file=sys.stderr)
        print(planK, file=sys.stderr)
    spark.stop()
    return 0 if (totals_ok and carry_ok and exact_ok is not False) else 1


if __name__ == "__main__":
    raise SystemExit(main())
