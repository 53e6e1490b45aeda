"""Salted-join equivalence + bucketed-write exchange elimination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpv_etl_code_spark.operators.skew import salted_join, write_bucketed
from hpv_etl_code_spark.sources.registry import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        o.join(c, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(o, c, "o_custkey", num_salts=8)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        write_bucketed(o, "b_orders", ["o_orderkey"], num_buckets=8)
        write_bucketed(li, "b_lineitem", ["l_orderkey"], num_buckets=8)
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join should be exchange-free"
        # and it still computes the right thing
        assert joined.count() == o.join(li, o.o_orderkey == li.l_orderkey).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_rejects_outer_variants(spark):
    big = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(big, small, on="k", how="full")
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(big, small, on="k", how="right")


def test_salted_left_join_matches_plain(spark):
    big = spark.range(20).withColumnRenamed("id", "k")
    small = (
        spark.range(5).withColumnRenamed("id", "k").withColumn("v", F.col("k") * 10)
    )
    got = salted_join(big, small, on="k", num_salts=4, how="left")
    want = big.join(small, "k", "left")
    assert sorted(got.collect()) == sorted(want.collect())


def test_aqe_splits_skewed_join_at_runtime(spark, sf_dir):
    """AQE's skew-join handling is the engine's FIRST line of defense at
    100 TB (salting is the manual fallback): with skew thresholds scaled
    to the fixture, the executed plan must mark the skewed sort-merge
    join (skew=true) — proving the runtime re-plan actually fires."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # ~90% of a 120k-row fact lands on key 0; the dim side is unique
        # per key (hot key on ONE side only — two-sided hot keys explode
        # quadratically and AQE can't help that)
        fact = spark.range(120_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.range(120_000).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 512).alias("p2"),
        )
        j = fact.join(dim, "k")
        # collect() executes THIS DataFrame's query execution — count()
        # or take() would build and execute a different plan, leaving
        # j's own AdaptiveSparkPlan unfinalized
        assert len(j.collect()) == 120_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
