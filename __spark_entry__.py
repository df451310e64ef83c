"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real code lives in the ``tile_etl_spark`` package; this module is a
thin view over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tile_etl_spark import registry  # noqa: E402

registry.load_all()

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "q_agg_group"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on sf0.001; driver checks rows>0."""
    return registry.QUERIES[FLAGSHIP](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twins for every H-checked qid (SURVEY §2B)."""
    return dict(registry.ORACLES)
