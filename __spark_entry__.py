"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on sf0.001 (HTML parse + byte-parity extract
                 through the engine's vectorized mapInPandas path).
queries()     -> one entry per implemented operator (SURVEY.md §2 +
                 training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()  -> the DuckDB-checkable ANSI SQL twin of every query.

All implementations live in htmpark.queries (REGISTRY); this module is just
the wiring the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the htmpark package importable regardless of the driver's cwd
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from htmpark.queries import REGISTRY, resolve_sql  # noqa: E402

# the driver runs the side-by-side gate at sf0.01; callable oracles (whose
# SQL text derives from table statistics, e.g. sim_lsh_buckets' bit width)
# are resolved against that directory.  At every gate scale the derived
# parameters equal their floors, so a mismatched assumption here would be
# caught by tools/check_oracle.py, which resolves at its own --sf.
_DRIVER_GATE_SF = "/root/testdata/sf0.01"

_SHIPPED_CONTEXTS: set = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``htmpark`` importable on the EXECUTORS regardless of the
    driver's cwd: the sys.path insert above fixes only the driver
    process — a Python worker unpickling a mapInPandas closure still
    resolves ``htmpark.*`` through its own path, which only works when
    the session was launched from this directory.  Shipping a package
    zip via ``addPyFile`` is the local-mode twin of the production
    ``spark-submit --py-files`` launch (north rule) and makes the
    contract cwd-independent.  Once per SparkContext."""
    import tempfile
    import zipfile

    sc = spark.sparkContext
    key = (id(sc), sc.applicationId)
    if key in _SHIPPED_CONTEXTS:
        return
    zpath = os.path.join(tempfile.gettempdir(),
                         f"htmpark_pyfiles_{os.getpid()}.zip")
    pkg = os.path.join(_HERE, "htmpark")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    zf.write(p, os.path.relpath(p, _HERE))
    sc.addPyFile(zpath)
    _SHIPPED_CONTEXTS.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: parse HTML-wrapped documents and extract byte-parity text."""
    _ship_package(spark)
    fn, _ = REGISTRY["html_parse_extract"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark, sf_dir):
            _ship_package(spark)
            return fn(spark, sf_dir)
        return run
    return {name: wrap(fn) for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: resolve_sql(sql, _DRIVER_GATE_SF)
            for name, (_fn, sql) in REGISTRY.items() if sql is not None}
