"""AQE RUNTIME evidence (SURVEY §4.2).

test_plan_quality.py pins static plan shapes; these tests pin what
ADAPTIVE execution actually did at runtime — the final (isFinalPlan)
plan after stage materialization. At 100 TB, AQE's runtime re-planning
(coalescing the post-shuffle partition count to the data's real size)
is the difference between 'shuffle.partitions must be hand-tuned per
query' and 'one global setting works'; these tests prove the engine's
session config leaves AQE in a state where that re-plan really fires.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tile_etl_spark import registry

registry.load_all()


def executed_plan(df) -> str:
    """Final adaptive plan — valid only AFTER an action on ``df``."""
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_finalizes_and_coalesces_small_aggregate(spark, sf_dir):
    """TPC-H Q1 shape: 8 shuffle partitions configured, 4 groups of
    output — the final plan must show AQE re-read the shuffle
    ('AQEShuffleRead coalesced'), not 8 near-empty reducers."""
    df = registry.QUERIES["q_agg_group"](spark, sf_dir)
    df.collect()
    p = executed_plan(df)
    assert "isFinalPlan=true" in p
    assert "AQEShuffleRead" in p and "coalesced" in p, p[:1500]


def test_aqe_coalesces_shuffled_join_reads(spark, sf_dir):
    """A deliberately non-broadcast join (threshold -1 via hint-free
    SMJ path): both shuffle reads must come back coalesced in the
    final plan — the runtime correction for over-provisioned
    parallelism on dimension-sized inputs."""
    li = registry.QUERIES["q_scan_project"](spark, sf_dir)
    right = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    j = (
        li.hint("merge")
        .join(right.hint("merge"), "l_orderkey")
        .groupBy()
        .agg(F.count(F.lit(1)).alias("total"))
    )
    j.collect()
    p = executed_plan(j)
    assert "isFinalPlan=true" in p
    assert "AQEShuffleRead" in p and "coalesced" in p, p[:1500]
