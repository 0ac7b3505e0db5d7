#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each queries() entry on Spark AND its oracle_sql() on DuckDB over the
same parquet tables, comparing row count + column names + an
order-insensitive value hash (columns sorted by name, rows sorted, values
stringified).  Usage:

    python tools/check_oracle.py [query ...] [--sf /root/testdata/sf0.01]
"""
import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    """Type-faithful cell rendering.

    The driver's hash is representation-sensitive (round 1 lesson: DuckDB
    SUM(BIGINT) -> HUGEINT -> Decimal hashed differently from Spark's int64
    even when values were equal), so each value is tagged with its Python
    type family: int vs Decimal vs float differ; naive vs tz-aware datetimes
    differ (isoformat carries the offset).  Rows must be fetched through
    Arrow (to_pylist) for DuckDB HUGEINT to surface as Decimal at all —
    fetchall() collapses it to int and masks the mismatch.
    """
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:NaN"
        return f"float:{round(v, 6)!r}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"bytes:{bytes(v).hex()}"
    if isinstance(v, str):
        return f"str:{v}"
    return f"{type(v).__name__}:{v}"


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "surrogateescape"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    import duckdb

    from htmpark.job import build_session
    from htmpark.queries import REGISTRY, resolve_sql

    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{args.sf}/{tbl}.parquet')"
        )

    spark = build_session("local[8]", shuffle_partitions=8, app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    names = args.queries or list(REGISTRY)
    failures = 0
    for name in names:
        fn, sql = REGISTRY[name]
        sql = resolve_sql(sql, args.sf)
        try:
            sdf = fn(spark, args.sf)
            stab = sdf.toArrow()
            scols = stab.column_names
            srows = [tuple(d[c] for c in scols) for d in stab.to_pylist()]
        except Exception as e:
            print(f"FAIL  {name:32s} spark error: {e}")
            failures += 1
            continue
        if sql is None:
            print(f"OK?   {name:32s} rows={len(srows)} (no oracle: rows-only)")
            continue
        try:
            dtab = con.execute(sql).arrow()
            dcols = dtab.column_names
            drows = [tuple(d[c] for c in dcols) for d in dtab.to_pylist()]
        except Exception as e:
            print(f"FAIL  {name:32s} duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {scols} vs {dcols}")
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if not problems:
            sh, dh = frame_hash(scols, srows), frame_hash(dcols, drows)
            if sh != dh:
                problems.append("value-hash mismatch")
                # show a diff sample
                sset = {tuple(norm_cell(v) for v in r) for r in srows}
                dset = {tuple(norm_cell(v) for v in r) for r in drows}
                only_s = list(sset - dset)[:2]
                only_d = list(dset - sset)[:2]
                problems.append(f"spark-only={only_s} duck-only={only_d}")
        if problems:
            print(f"FAIL  {name:32s} " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK    {name:32s} rows={len(srows)}")
    spark.stop()
    if not args.queries and not failures:
        _record_replica_manifest(args.sf, names)
    sys.exit(1 if failures else 0)


def _record_replica_manifest(sf, names):
    """Record a full-registry green replica run for the order checker.

    tools/check_registry_order.py requires every tail (>WINDOW) entry to be
    green in the LATEST driver CORRECTNESS file; right after the driver
    drops a new file, the rotated-out tail is structurally stale and the
    checker goes red until the next rotation (this exact red opened rounds
    7 and 8).  The manifest closes that window: a full replica run on this
    tree is equally fresh evidence, so the checker accepts "green in latest
    driver file OR green in a replica manifest that (a) post-dates the
    latest driver file and (b) fingerprint-matches the current source".

    Only gate-scale-or-above runs are recorded (r8 ADVICE): a green run at
    the default sub-gate sf0.001 must not OVERWRITE a valid sf0.01
    manifest with one the order checker rejects (replica_scale_ok) —
    that fails safe but silently destroys evidence.
    """
    import json

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from check_registry_order import (  # noqa: E402 (same dir)
        REPLICA_MIN_SF, fingerprint, latest_correctness, replica_scale_ok)

    from htmpark.queries import REGISTRY

    if not replica_scale_ok(args_sf_base(sf)):
        print(f"replica manifest NOT recorded: sf {args_sf_base(sf)!r} is "
              f"below the driver gate scale (needs sf >= "
              f"{REPLICA_MIN_SF}); existing manifest left untouched")
        return

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    manifest = {
        "sf": args_sf_base(sf),
        "latest_driver": latest_correctness(repo_root),
        "queries": {name: fingerprint(*REGISTRY[name]) for name in names},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "replica_manifest.json")
    json.dump(manifest, open(path, "w"), indent=1, sort_keys=True)
    print(f"replica manifest recorded ({len(names)} green) -> {path}")


def args_sf_base(sf):
    return os.path.basename(os.path.normpath(sf))


if __name__ == "__main__":
    main()
