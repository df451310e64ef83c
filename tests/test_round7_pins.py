"""Round-7 regression pins.

Each test pins a specific round-7 win so a future change cannot
silently undo it:

- the cell-decomposed money aggregates are value-identical to their
  canonical single-pass forms (the exactness argument, checked
  in-engine, independent of the DuckDB oracle);
- the bucketed top-k plan stays exchange-free and cell-Q1 keeps the
  canonical stage budget;
- the window interval rewrite matches the banding helper;
- persist dedupe holds for the HOF/checkpoint plans that
  sameSemantics cannot match (the round-7 cache blind-spot fix);
- the persisted tile inventory re-pins itself after a scope eviction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tile_etl_spark import cache, registry
from tile_etl_spark.io import table_view
from tile_etl_spark.operators.aggregates import _Q1_SQL

registry.load_all()


def rows(df):
    return sorted(map(tuple, df.collect()))


def executed(df) -> str:
    """Final executed plan only — AQE's toString appends the
    '== Initial Plan ==' section, which double-counts every node."""
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    return p.split("== Initial Plan ==")[0]


def test_cells_q1_equals_canonical_in_engine(spark, sf_dir):
    """The cents/cells rewrite must reproduce canonical Q1 BIT-forBIT
    inside Spark itself (the driver's oracle check only compares
    against DuckDB; this pins the distributivity argument in-engine)."""
    t = table_view(spark, sf_dir, "lineitem")
    canonical = spark.sql(_Q1_SQL.format(t=t))
    cells = registry.QUERIES["q_agg_group"](spark, sf_dir)
    assert rows(canonical) == rows(cells)


def test_interval_window_equals_banding_helper(spark, sf_dir):
    """q_join_interval's range-frame window form ≡ the banding
    equi-join helper on the same events."""
    from tile_etl_spark.io import load
    from tile_etl_spark.operators.joins import interval_self_join

    w = registry.QUERIES["q_join_interval"](spark, sf_dir)
    b = interval_self_join(load(spark, sf_dir, "events"))
    assert rows(w) == rows(b.select("user_id", "id1", "id2"))


def test_topk_per_group_executes_exchange_free(spark, sf_dir):
    """The custkey-bucketed orders table must satisfy the window's
    distribution: zero Exchange nodes in the EXECUTED plan (sparkPlan
    is pre-EnsureRequirements and would pass vacuously)."""
    from tile_etl_spark.operators.bucketed import orders_by_custkey

    if orders_by_custkey(spark, sf_dir) is None:
        import pytest

        pytest.skip("no metastore in this environment")
    p = executed(registry.QUERIES["q_topk_per_group"](spark, sf_dir))
    assert "Exchange" not in p, p[:1500]
    assert "WindowGroupLimit" in p


def test_cells_q1_has_canonical_stage_budget(spark, sf_dir):
    """The coalesce(1) stitch must keep cell-Q1 at ONE exchange — the
    canonical Q1 stage count — not add a shuffle per level."""
    p = executed(registry.QUERIES["q_agg_group"](spark, sf_dir))
    assert p.count("Exchange") <= 1, p[:2000]
    assert "Coalesce" in p


def test_hof_persist_dedupe_does_not_leak(spark, sf_dir):
    """Building q_dedup_near twice must not grow the tracked cache:
    its LSH plan's LATERAL VIEW lambdas defeat sameSemantics, so the
    keyed-dedupe path is the only thing preventing one fresh candidate
    cache per rebuild (the round-7 blind-spot fix)."""
    fn = registry.QUERIES["q_dedup_near"]
    fn(spark, sf_dir)
    n1 = len(cache._CACHED)
    fn(spark, sf_dir)
    assert len(cache._CACHED) == n1


def test_tile_inventory_repins_after_scope_eviction(spark, sf_dir):
    """A foreign scope evicts the persisted grid/manifest; the next
    tile call must re-pin (and still return correct counts)."""
    from tile_etl_spark.tiles.grid import tile_grid, tile_manifest

    g = tile_grid(spark)
    n = g.count()
    cache.scope("unrelated_q")  # evicts tiles_manifest handles
    assert tile_grid(spark).count() == n
    tags = {t for t, _, _ in cache._CACHED}
    assert "tiles_manifest" in tags
    m = tile_manifest(spark)
    assert m.count() > 0


def test_expand_aggregates_run_over_cells_single_sql(spark, sf_dir):
    """ROLLUP/CUBE/GROUPING SETS (r12 re-plan, measured by interleaved
    A/Bs at sf0.1 AND sf1 — see q_agg_rollup docstring): the Expand
    runs over the pre-aggregated CELLS, never over the fact scan — a
    direct Expand replicates per-row work 3-4x and measured 2x slower
    at sf1 (the 100 TB-relevant direction), while the cells shape's
    second exchange carries ~15 rows per partition at any scale. Two
    HashAggregates must sit between the Expand and the scan (the
    cells partial+final pair), exactly TWO real exchanges total
    (cells shuffle + constant-size rollup shuffle), and the per-row
    inputs stay exact BIGINT cents / plain counts — never per-row
    BigDecimal."""
    for qid in ("q_agg_rollup", "q_agg_cube", "q_agg_gsets"):
        p = executed(registry.QUERIES[qid](spark, sf_dir))
        expand_at = p.find("Expand")
        assert expand_at != -1, (qid, p[:2000])
        below = p[expand_at:]
        scan_at = below.find("Scan parquet")
        if scan_at == -1:
            scan_at = below.find("FileScan")
        assert scan_at != -1, (qid, below[:1500])
        # the cells aggregate pair lives between Expand and the scan
        assert below[:scan_at].count("HashAggregate") >= 2, (
            qid,
            below[:1500],
        )
        n_reused = p.count("ReusedExchange")
        n_real = p.count("Exchange hashpartitioning") - n_reused
        assert n_real == 2, (qid, n_real, p[:2000])
        assert "sortAggregate" not in p.lower(), (qid, p[:2000])


def test_pivot_condagg_equals_pivot_api_and_plans_single_agg(
    spark, sf_dir
):
    """r12: q_pivot ships the conditional-aggregation form (what
    Catalyst lowers a single-agg explicit-value .pivot() to), measured
    -43% vs the multi-agg .pivot() plan at sf0.1. Two pins: (a) the
    .pivot() API over the same cents input is value-identical to the
    shipped query (keeps the API surface exercised in-engine); (b) the
    shipped plan is ONE partial+final hash agg pair with ONE exchange
    and no PivotFirst second aggregate."""
    from pyspark.sql import functions as F

    from tile_etl_spark.io import as_double, load

    shipped = registry.QUERIES["q_pivot"](spark, sf_dir)

    o = load(spark, sf_dir, "orders")
    piv = (
        o.select(
            "o_orderpriority",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("pc"),
        )
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.struct(
                F.count(F.lit(1)).alias("n"), F.sum("pc").alias("pc")
            )
        )
    )

    def spend(c):
        return as_double(
            F.col(c).cast("decimal(30,0)")
            * F.lit(0.01).cast("decimal(3,2)")
        )

    api = piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F.n"), F.lit(0)).cast("bigint").alias("n_f"),
        F.coalesce(F.col("O.n"), F.lit(0)).cast("bigint").alias("n_o"),
        F.coalesce(F.col("P.n"), F.lit(0)).cast("bigint").alias("n_p"),
        spend("F.pc").alias("spend_f"),
        spend("O.pc").alias("spend_o"),
        spend("P.pc").alias("spend_p"),
    )
    key = lambda t: str(t[0])  # noqa: E731
    assert sorted(map(tuple, shipped.collect()), key=key) == sorted(
        map(tuple, api.collect()), key=key
    )

    p = executed(shipped)
    assert "PivotFirst" not in p and "pivotfirst" not in p, p[:1500]
    n_reused = p.count("ReusedExchange")
    n_real = p.count("Exchange hashpartitioning") - n_reused
    assert n_real == 1, (n_real, p[:1500])


def test_tumbling_date_trunc_equals_window_operator(spark, sf_dir):
    """r12: q_window_tumbling buckets with date_trunc('hour', ts) —
    value-identical to window(ts, '1 hour').start for epoch-aligned
    tumbling windows but without the per-row (start,end) struct build
    (-17% at sf0.1). Pin the equivalence in-engine so the cheaper key
    can never drift from the window-operator semantics the streaming
    twin (s_tumbling) runs."""
    t = table_view(spark, sf_dir, "events")
    via_window = spark.sql(
        f"""
        SELECT w.start AS window_start, event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(CAST(round(value * 1000000) AS BIGINT)
                             AS DECIMAL(27,0)))
                    * CAST(0.000001 AS DECIMAL(7,6)) AS DOUBLE)
                 AS sum_value
        FROM (SELECT window(ts, '1 hour') AS w, event_type, value
              FROM {t})
        GROUP BY w, event_type
        """
    )
    shipped = registry.QUERIES["q_window_tumbling"](spark, sf_dir)
    key = lambda r: (str(r[0]), str(r[1]))  # noqa: E731
    assert sorted(map(tuple, shipped.collect()), key=key) == sorted(
        map(tuple, via_window.collect()), key=key
    )
