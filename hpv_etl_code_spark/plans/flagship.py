"""Flagship query: pricing-summary rollup on ``lineitem``.

This is the reference pipeline's core semantic (grouped SUM rollup,
``/root/reference/src/main.py:87-119``) re-expressed on the driver's
TPC-H-ish corpus: a TPC-H Q1-shaped aggregation. One scan, one shuffle
(partial/final hash agg around a single exchange), AQE-coalesced output.

All sums go through exact decimals (functions/numeric.py) so results are
order-independent — required for the DuckDB differential gate and for
run-to-run stability on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import avg6, dsum
from ..sources.registry import load_table
from .fanout import fan_out


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (returnflag, linestatus): quantity/price sums, averages, count.

    The scan is fanned out before the aggregate (round 9, guide §2.5):
    the bench corpus is one row group per table, so the partial decimal
    sums — the expensive part by design — ran on a single task. Exact
    decimal sums are partitioning-independent, so results are
    bit-identical; the repartition node vanishes at production scan
    sizes (plans/fanout.py). The fan-out key is ``l_extendedprice`` —
    high-cardinality (distinct values ≫ partitions, guide §2.5) and
    already in the query's column set, so the scan stays pruned to
    exactly the six columns the aggregate needs
    (tests/test_physical_plans.py::test_flagship_scan_is_column_pruned;
    keying on ``l_orderkey`` widened ReadSchema by a column)."""
    li = fan_out(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ),
        sf_dir,
        "lineitem",
        key="l_extendedprice",
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            avg6("l_quantity").alias("avg_qty"),
            avg6("l_extendedprice").alias("avg_price"),
            avg6("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS sum_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS sum_charge,
  ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity), 6) AS avg_qty,
  ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice), 6) AS avg_price,
  ROUND(CAST(CAST(SUM(CAST(l_discount AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
