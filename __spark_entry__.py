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

from htmpark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: parse HTML-wrapped documents and extract byte-parity text."""
    fn, _ = REGISTRY["html_parse_extract"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
