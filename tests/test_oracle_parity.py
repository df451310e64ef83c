"""The engine-wide correctness gate, run locally at sf0.001: every
registered qid with an oracle twin must match DuckDB exactly —
row-count, column names, and order-insensitive canonical values. This
is the same contract the driver enforces at sf0.01."""

from __future__ import annotations

import pytest

from tile_etl_spark import registry
from tests._compare import assert_query_matches_oracle

registry.load_all()

H_QIDS = sorted(registry.ORACLES)


@pytest.mark.parametrize("qid", H_QIDS)
def test_oracle_parity(qid, spark, duck, sf_dir):
    fn = registry.QUERIES[qid]
    sql = registry.ORACLES[qid]
    assert_query_matches_oracle(fn, sql, spark, duck, sf_dir, qid=qid)


def test_every_query_runs(spark, sf_dir):
    """Oracle-less (B/R) qids must at least run and return a DataFrame
    with a stable schema."""
    for qid, fn in sorted(registry.QUERIES.items()):
        if qid in registry.ORACLES:
            continue
        df = fn(spark, sf_dir)
        assert df.columns, qid
        assert df.count() >= 0, qid
