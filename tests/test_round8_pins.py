"""Round-8 regression pins.

- cells-Q1 must equal canonical Q1 even when the measure columns carry
  NULLs (ADVICE r7: the old rewrite divided the averages by count(*)
  instead of count(col), an identity that held only on fully non-null
  fixtures — the denominators now carry per-cell non-null counts);
- the q_join_interval range-frame rewrite must survive a pathological
  hot key (one user, 1500 events inside one band; the 20k-event volume
  twin is stress 10) and still equal the banding helper (VERDICT r7
  ask #5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tile_etl_spark import registry
from tile_etl_spark.io import load
from tile_etl_spark.operators.aggregates import _Q1_SQL, q1_from_cells

registry.load_all()


def rows(df):
    return sorted(map(tuple, df.collect()))


def test_cells_q1_equals_canonical_with_nulls(spark, sf_dir):
    """Inject NULLs into every Q1 measure column (quantity, price,
    discount, tax — on overlapping-but-distinct row subsets, so cells
    with partial NULLs, all-NULL measures, and NULL dc/tc keys all
    occur) and pin bit-equality of the cells rewrite vs canonical Q1
    in-engine."""
    li = load(spark, sf_dir, "lineitem")
    nullified = li.select(
        "l_returnflag",
        "l_linestatus",
        F.when(F.col("l_orderkey") % 7 != 0, F.col("l_quantity")).alias(
            "l_quantity"
        ),
        F.when(F.col("l_orderkey") % 11 != 0, F.col("l_extendedprice")).alias(
            "l_extendedprice"
        ),
        F.when(F.col("l_orderkey") % 5 != 0, F.col("l_discount")).alias(
            "l_discount"
        ),
        F.when(F.col("l_orderkey") % 13 != 0, F.col("l_tax")).alias("l_tax"),
    )
    v = "__q1_nulls_pin"
    nullified.createOrReplaceTempView(v)
    # sanity: the fixture actually exercises NULLs in every column
    nn = nullified.agg(
        *[
            F.sum(F.col(c).isNull().cast("int")).alias(c)
            for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        ]
    ).first()
    assert all(n > 0 for n in nn), nn
    canonical = spark.sql(_Q1_SQL.format(t=v))
    assert rows(canonical) == rows(q1_from_cells(spark, v))


def executed(df) -> str:
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    return p.split("== Initial Plan ==")[0]


def test_round8_additions_plan_shapes(spark, sf_dir):
    """The four round-8 qids must keep their declared scale shapes:
    - q_merge_audit / q_table_changes: ONE full-outer join pass (no
      4-way re-read of the join), no nested loop;
    - q_table_changes: explode (Generate), not a union of re-joins;
    - q_kanon_audit / q_table_checksum: single-aggregation pipelines —
      exactly one exchange, no join at all."""
    p = executed(registry.QUERIES["q_merge_audit"](spark, sf_dir))
    assert p.count("FullOuter") == 1, p[:1500]
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    p = executed(registry.QUERIES["q_table_changes"](spark, sf_dir))
    assert p.count("FullOuter") == 1, p[:1500]
    assert "Generate" in p
    for qid in ("q_kanon_audit", "q_table_checksum"):
        p = executed(registry.QUERIES[qid](spark, sf_dir))
        assert "Join" not in p, (qid, p[:1500])
        assert p.count("Exchange") == 1, (qid, p[:1500])


def test_table_checksum_localizes_a_mutation(spark, sf_dir):
    """The reconciliation property the operator exists for: mutating
    ONE row's value changes EXACTLY that row's bucket fingerprint and
    no other bucket."""
    o = load(spark, sf_dir, "orders")
    first = o.select("o_orderkey").orderBy("o_orderkey").first()[0]
    mutated = o.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") == first, F.col("o_totalprice") + 0.01
        ).otherwise(F.col("o_totalprice")),
    )
    base = {
        r["bucket"]: (r["n_rows"], r["content_xor"], r["total_cents"])
        for r in registry.QUERIES["q_table_checksum"](
            spark, sf_dir
        ).collect()
    }

    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    row_h = (
        ((F.col("o_orderkey") % F.lit(2147483647)) * F.lit(2654435761))
        .bitwiseXOR(F.col("o_custkey") * F.lit(40503))
        .bitwiseXOR(
            (cents * F.lit(69069)).bitwiseXOR(
                F.ascii("o_orderstatus").cast("bigint")
            )
        )
    )
    mut = {
        r["bucket"]: (r["n_rows"], r["content_xor"], r["total_cents"])
        for r in mutated.select(
            (F.col("o_orderkey") % 16).alias("bucket"),
            row_h.alias("row_h"),
            cents.alias("cents"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.bit_xor("row_h").cast("bigint").alias("content_xor"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .collect()
    }
    diff = {b for b in base if base[b] != mut.get(b)}
    assert diff == {first % 16}, diff


def test_foreachbatch_upsert_epoch_replay_is_idempotent(spark, tmp_path):
    """The exactly-once contract of the foreachBatch upsert sink under
    a CRASH-REPLAY: epoch N retried after v{N} was written but before
    the checkpoint committed. The merge baseline must be the newest
    version STRICTLY BELOW the epoch — reading versions()[-1] (the
    retried epoch's own output) both corrupts the baseline when v{N}
    was partial and makes Spark refuse to overwrite a path it is
    reading from."""
    import os
    from datetime import datetime

    from tile_etl_spark.streaming.queries import make_upsert_sink

    base = str(tmp_path / "upsert")
    os.makedirs(base)
    upsert, versions = make_upsert_sink(spark, base)
    schema = "user_id bigint, value double, ts timestamp, event_id bigint"
    b0 = spark.createDataFrame(
        [(1, 10.0, datetime(2024, 1, 1), 1), (2, 20.0, datetime(2024, 1, 1), 2)],
        schema,
    )
    b1 = spark.createDataFrame(
        [(1, 11.0, datetime(2024, 1, 2), 3), (3, 30.0, datetime(2024, 1, 2), 4)],
        schema,
    )
    upsert(b0, 0)
    upsert(b1, 1)
    expect = sorted(map(tuple, spark.read.parquet(versions()[-1]).collect()))
    assert len(expect) == 3  # users 1 (updated), 2 (kept), 3 (inserted)

    # clean replay of the committed epoch: state unchanged, no error
    upsert(b1, 1)
    assert sorted(
        map(tuple, spark.read.parquet(versions()[-1]).collect())
    ) == expect

    # poisoned replay: v00001 was only PARTIALLY written before the
    # crash (one bogus row); the retry must rebuild it from v00000 +
    # the batch, not from the partial output
    spark.createDataFrame(
        [(1, 99.0, datetime(2024, 1, 3), 9)], schema
    ).selectExpr(
        "user_id",
        "value AS last_value",
        "ts AS last_ts",
        "event_id AS last_event_id",
    ).write.mode("overwrite").parquet(os.path.join(base, "v00001"))
    upsert(b1, 1)
    assert sorted(
        map(tuple, spark.read.parquet(versions()[-1]).collect())
    ) == expect


def test_redefined_oracles_agree_with_independent_forms():
    """ADVICE r7: the r7-redefined q_rel_division / q_scd2_snapshot
    oracles were authored by the same change they verify. Cross-check
    each against a STRUCTURALLY DIFFERENT formulation (double
    NOT-EXISTS for the division; argmax-per-key instead of lead() for
    the snapshot) in DuckDB at sf0.01, where both queries are
    non-vacuous (21 and 150 rows)."""
    import duckdb

    con = duckdb.connect()
    for t in ("part", "orders", "lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        )
    alt_div = """
    SELECT c.custkey,
           (SELECT count(DISTINCT p_brand) FROM part) AS n_brands
    FROM (SELECT DISTINCT o_custkey AS custkey FROM orders) c
    WHERE NOT EXISTS (
      SELECT 1 FROM (SELECT DISTINCT p_brand AS brand FROM part) b
      WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE o.o_custkey = c.custkey AND p.p_brand = b.brand))
    ORDER BY custkey
    """
    alt_scd2 = """
    WITH ranked AS (
      SELECT user_id, event_id, CAST(value AS DOUBLE) AS value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
      WHERE event_type = 'purchase'
        AND ts <= TIMESTAMP '2024-01-15 00:00:00'
    )
    SELECT user_id, event_id, value, ts AS valid_from
    FROM ranked WHERE rn = 1 ORDER BY user_id, event_id
    """
    div = con.execute(
        registry.ORACLES["q_rel_division"] + " ORDER BY custkey"
    ).fetchall()
    assert div == con.execute(alt_div).fetchall()
    assert len(div) == 21
    scd = con.execute(
        registry.ORACLES["q_scd2_snapshot"] + " ORDER BY user_id, event_id"
    ).fetchall()
    assert scd == con.execute(alt_scd2).fetchall()
    assert len(scd) == 150


def test_connected_components_raises_on_nonconvergence(spark):
    """An exhausted round budget must FAIL LOUDLY, not return labels
    that silently split one true component into several (multiple
    survivors per near-dup cluster). A 0-1-...-10 chain needs 10
    propagation rounds; 3 must raise, 15 must converge to one
    component."""
    import pytest

    from tile_etl_spark.llm.curation import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="star-contraction"):
        connected_components(chain, max_rounds=3)
    out = connected_components(chain, max_rounds=15)
    assert out.where(F.col("component") != 0).count() == 0
    assert out.count() == 11


def test_dedup_cluster_warm_build_skips_the_cc_loop(spark, sf_dir):
    """The pre-build cache lookup must make a warm q_dedup_cluster
    BUILD job-free: connected_components runs its checkpoint/count
    jobs during plan construction, so without the lookup every warm
    rerun re-paid the whole fixpoint (persist-time dedupe can only
    skip storage)."""
    fn = registry.QUERIES["q_dedup_cluster"]
    fn(spark, sf_dir).count()  # cold: runs and caches the assignment
    sc = spark.sparkContext
    sc.setJobGroup("cc_warm_probe", "probe")
    fn(spark, sf_dir)  # builder only — no action
    ids = sc.statusTracker().getJobIdsForGroup("cc_warm_probe")
    sc.setJobGroup(None, None)
    assert not ids, f"warm q_dedup_cluster build ran {len(ids)} job(s)"


def test_lsh_two_pass_equals_single_pass(spark, sf_dir):
    """The count-gated (memory-bounded) LSH bucket plan must produce
    exactly the single-pass plan's candidate pairs — the plan-stats
    gate flips between them by corpus size, so they must be
    interchangeable (and the two-pass form is what ships at 100 TB,
    where collect_set buffers must never exceed max_bucket members)."""
    from tile_etl_spark import cache
    from tile_etl_spark.io import load
    from tile_etl_spark.llm.dedup import (
        _parallelize_docs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    cache.scope("lsh_two_pass_pin")
    d = _parallelize_docs(load(spark, sf_dir, "documents"))
    sigs = minhash_signatures(d)
    one = sorted(
        map(tuple, lsh_candidate_pairs(sigs, two_pass=False).collect())
    )
    two = sorted(
        map(tuple, lsh_candidate_pairs(sigs, two_pass=True).collect())
    )
    assert one and one == two
    cache.scope("lsh_two_pass_pin_done")


def test_near_memo_is_bounded(spark, sf_dir):
    """_NEAR_MEMO keeps exactly ONE entry per sf_dir (ADVICE r7: the
    old (session, sf_dir, fingerprint) keying grew unboundedly and
    pinned dead sessions alive); a stale session id in the stored
    entry forces a rebuild that REPLACES it."""
    from tile_etl_spark.llm import dedup

    fn = registry.QUERIES["q_dedup_near"]
    fn(spark, sf_dir)
    fn(spark, sf_dir)
    assert list(dedup._NEAR_MEMO) == [sf_dir]
    ent = dedup._NEAR_MEMO[sf_dir]
    dedup._NEAR_MEMO[sf_dir] = (-1,) + ent[1:]  # simulate dead session
    fn(spark, sf_dir)
    assert list(dedup._NEAR_MEMO) == [sf_dir]
    assert dedup._NEAR_MEMO[sf_dir][0] == id(spark)


def test_persist_scoped_key_collision_fails_loudly(spark):
    """A (tag, key) hit whose cached schema differs from the caller's
    plan must raise, not silently return the wrong frame (ADVICE r7:
    the key string was trusted as full plan identity)."""
    import pytest

    from tile_etl_spark import cache

    cache.scope("collision_pin")
    a = spark.range(3).selectExpr(
        "id", "transform(array(id), x -> x + 1) AS arr"
    )
    b = spark.range(3).selectExpr(
        "id AS other", "transform(array(id), x -> x + 2) AS brr"
    )
    assert cache.persist_scoped(a, key="pin_k1") is not None
    with pytest.raises(RuntimeError, match="key collision"):
        cache.persist_scoped(b, key="pin_k1")
    cache.scope("collision_pin_done")


def test_interval_rewrite_survives_hot_key(spark):
    """One user with 1500 events inside a single 5-minute band — the
    worst case for the range-frame collect_list rewrite (the frame is
    O(m) per event). The output must equal the banding equi-join
    helper ROW-FOR-ROW and have the full m*(m-1)/2 cardinality,
    proving the frame did not truncate. The volume run (20k events,
    200M pairs, checksum equality) is stress 10 in
    tools/scale_stress.py."""
    from tile_etl_spark.operators.joins import (
        interval_self_join,
        interval_self_join_window,
    )

    m = 1500
    ev = spark.range(m).select(
        F.col("id").alias("event_id"),
        # pmod-anchored constant (a bare lit would fold out of the
        # window PARTITION BY and trigger the WindowExec warning)
        (F.pmod(F.col("id"), F.lit(1)) + 7).alias("user_id"),
        # all inside one 5-min band: timestamps 0..29s apart
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 30).alias(
            "ts"
        ),
    )
    w = interval_self_join_window(ev).select("user_id", "id1", "id2")
    b = interval_self_join(ev).select("user_id", "id1", "id2")
    n_w = w.count()
    assert n_w == m * (m - 1) // 2
    assert rows(w) == rows(b)
