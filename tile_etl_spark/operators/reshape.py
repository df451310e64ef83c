"""Pivot/unpivot and subquery shapes — beyond SURVEY §2B's letter but
inside its spirit: the remaining everyday SQL surface a user migrating
a warehouse workload expects. All Catalyst-native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tile_etl_spark.io import as_double, dec, load
from tile_etl_spark.registry import query
from tile_etl_spark.session import ensure_session_determinism


@query(
    "q_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS spend_f,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS spend_o,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS spend_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on an EXPLICIT value list — the only scale-safe form (an
    unlisted pivot needs a distinct-values pre-pass over the fact
    table). Planned as one aggregate with conditional expressions, same
    as the oracle's FILTER clauses."""
    ensure_session_determinism(spark)
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            as_double(F.sum(dec("o_totalprice"))).alias("spend"),
        )
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce("F_n", F.lit(0)).alias("n_f"),
        F.coalesce("O_n", F.lit(0)).alias("n_o"),
        F.coalesce("P_n", F.lit(0)).alias("n_p"),
        F.col("F_spend").alias("spend_f"),
        F.col("O_spend").alias("spend_o"),
        F.col("P_spend").alias("spend_p"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, kind, round(amount, 6) AS amount
    FROM (
      SELECT l_orderkey, l_linenumber,
             unnest(['price', 'discount', 'tax']) AS kind,
             unnest([l_extendedprice, l_discount, l_tax]) AS amount
      FROM lineitem
    )
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide → long without a shuffle — a generator
    expression per row, the columnar-friendly normalization step."""
    ensure_session_determinism(spark)
    li = load(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "kind",
        "amount",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("kind") == "l_extendedprice", "price")
        .when(F.col("kind") == "l_discount", "discount")
        .otherwise("tax")
        .alias("kind"),
        F.round("amount", 6).alias("amount"),
    )


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 6)
             AS dev_from_mean
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: planned once, broadcast as a
    literal into the filter/projection (Catalyst subquery execution)."""
    ensure_session_determinism(spark)
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               round(o_totalprice - (SELECT avg(o_totalprice) FROM orders_sq), 6)
                 AS dev_from_mean
        FROM orders_sq
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_sq)
        """
    )


@query(
    "q_subquery_corr",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE c.c_acctbal > (
      SELECT 0.001 * sum(o.o_totalprice) FROM orders o
      WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def q_subquery_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: Catalyst decorrelates it into an
    aggregate + join — never a per-row re-execution (the plan-quality
    suite's no-nested-loop rule applies here too)."""
    ensure_session_determinism(spark)
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_sqc")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_sqc")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer_sqc c
        WHERE c.c_acctbal > (
          SELECT 0.001 * sum(o.o_totalprice) FROM orders_sqc o
          WHERE o.o_custkey = c.c_custkey
        )
        """
    )
