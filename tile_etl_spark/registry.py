"""Query registry — the single source of truth behind ``__spark_entry__``.

Every operator from SURVEY.md §2B registers here with a qid, a PySpark
builder ``(spark, sf_dir) -> DataFrame`` and (for H-checked qids) the
DuckDB ANSI-SQL oracle twin. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over these dicts.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query builder, optionally with its DuckDB oracle twin.

    Oracle-less registrations get the driver's weaker rows-only check
    (streaming / non-SQL-expressible ops — SURVEY §2B codes B and R).
    """

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            # Collapse whitespace for readable driver JSON. Line comments
            # would swallow the rest of the query — forbid them.
            assert "--" not in oracle, f"{name}: no '--' comments in oracle SQL"
            ORACLES[name] = " ".join(oracle.split())
        fn.__qid__ = name
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    import tile_etl_spark.all_queries  # noqa: F401
