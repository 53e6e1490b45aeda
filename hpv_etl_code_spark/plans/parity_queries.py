"""M2 catalog entries: reference-parity operators on the test corpus.

Each entry pairs a Spark plan with a DuckDB oracle (SURVEY §2.3/§2.5):
unpivot (R1), pivot (R2), the labeled-cube rollup (A1/A2), sentinel
cleaning (P6), and the fixture-driven end-to-end HPV pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import sentinels_to_null
from ..functions.numeric import dsum
from ..operators.reshape import unpivot
from ..operators.rollup import cube_rollup_labeled
from ..sources.registry import load_table
from . import hpv_fixture
from .fanout import fan_out
from .hpv_pipeline import run_pipeline


def unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: melt part's numeric measures into (measure, val) rows — an
    Expand node, narrow and shuffle-free."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    )
    return unpivot(part, ["p_partkey"], None, "measure", "val")


UNPIVOT_PART_SQL = """
SELECT p_partkey, measure, val
FROM (
  UNPIVOT (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, p_retailprice FROM part)
  ON p_size, p_retailprice INTO NAME measure VALUE val
)
"""


def pivot_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: pivot linestatus into measure columns with an explicit value
    list (skips the distinct-discovery job)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
        .withColumnsRenamed({"F": "qty_f", "O": "qty_o"})
    )


PIVOT_LINEITEM_SQL = """
SELECT l_returnflag,
  CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(20,8)) END) AS VARCHAR) AS DOUBLE) AS qty_f,
  CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(20,8)) END) AS VARCHAR) AS DOUBLE) AS qty_o
FROM lineitem GROUP BY l_returnflag
"""


def cube_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 as one grouping-sets pass: every (flag-level × status-level)
    combination with rollup labels — the reference's 3-scan/2-shuffle
    copy-union pattern collapsed into one exchange.

    Round 9: the scan fans out first (guide §2.5 — one row group per
    bench table means the Expand×4 + partial decimal sums ran on a
    single task); exact sums are partitioning-independent, and the
    repartition vanishes at production scan sizes (plans/fanout.py)."""
    li = fan_out(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_linestatus", "l_quantity", "l_orderkey"
        ),
        sf_dir,
        "lineitem",
        key="l_orderkey",
    )
    return cube_rollup_labeled(
        li,
        fixed_dims=[],
        labeled_dims={"l_returnflag": "ALL_FLAGS", "l_linestatus": "ALL_STATUS"},
        aggs=[
            dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        ],
    )


CUBE_PRICING_SQL = """
SELECT
  CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL_FLAGS' ELSE l_returnflag END AS l_returnflag,
  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL_STATUS' ELSE l_linestatus END AS l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
"""


def sentinel_clean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: sentinel→NULL scoped to a named column (here pretending two
    event types are suppression markers)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        sentinels_to_null("event_type", ("error", "click")).alias("event_type_clean"),
    )


SENTINEL_CLEAN_SQL = """
SELECT event_id,
  CASE WHEN event_type IN ('error', 'click') THEN NULL ELSE event_type END
    AS event_type_clean
FROM events
"""


def hpv_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole reference ETL on the shared literal fixture (ignores
    sf_dir — input is the fixture so the oracle sees identical data)."""
    files = hpv_fixture.build_spark_files(spark)
    return run_pipeline(files, hpv_fixture.EXTRACT_DATE)


def register_entries(register) -> None:  # noqa: ANN001
    register("unpivot_part", unpivot_part, UNPIVOT_PART_SQL)
    register("pivot_lineitem_status", pivot_lineitem_status, PIVOT_LINEITEM_SQL)
    register("cube_pricing_rollup", cube_pricing_rollup, CUBE_PRICING_SQL, headline=True)
    register("sentinel_clean_events", sentinel_clean_events, SENTINEL_CLEAN_SQL)
    register("hpv_pipeline_e2e", hpv_pipeline_e2e, hpv_fixture.render_oracle_sql())
