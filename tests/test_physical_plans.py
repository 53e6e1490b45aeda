"""Physical-plan regression tests — the scale properties the explain
audit verified, locked in as assertions so they can't silently rot:

- dimension joins stay broadcast (no fact shuffle),
- filters stay pushed into parquet scans,
- scans stay column-pruned,
- per-group top-k keeps the WindowGroupLimit rank pushdown,
- global top-k keeps TakeOrderedAndProject (never a full sort),
- the HPV pipeline keeps its 2-exchange topology (pivot + rollup),
  independent of input file count.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpv_etl_code_spark import catalog


def _plan(spark, sf_dir, name: str) -> str:
    df = catalog.entries()[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_dim_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_broadcast_dims")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_anti_join_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_anti")
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan


def test_flagship_scan_is_column_pruned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    import re

    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    cols = {c.split(":")[0] for c in schema.split(",")}
    assert cols == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
    }, f"scan reads more than the query needs: {cols}"


def test_topk_uses_window_group_limit(spark, sf_dir):
    assert "WindowGroupLimit" in _plan(spark, sf_dir, "window_topk_per_group")


def test_sort_limit_uses_take_ordered(spark, sf_dir):
    assert "TakeOrderedAndProject" in _plan(spark, sf_dir, "sort_limit_top_orders")


def test_hpv_pipeline_two_exchange_topology(spark, sf_dir):
    plan = _plan(spark, sf_dir, "hpv_pipeline_e2e")
    import re

    exchanges = {m for m in re.findall(r"\((\d+)\) Exchange", plan)}
    assert len(exchanges) == 2, (
        f"pipeline must shuffle exactly twice (pivot + rollup), saw {len(exchanges)}"
    )


def test_json_scan_prunes_to_two_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "json_extract_events")
    import re

    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert {c.split(":")[0] for c in schema.split(",")} == {"event_id", "props"}


def test_partition_pruning_static_and_dynamic(spark, sf_dir, tmp_path):
    """The 100 TB layout lever: a year-partitioned fact table must (a)
    prune partitions statically for a literal filter and (b) prune via
    a runtime (dynamic) filter when joined to a filtered dimension."""
    from hpv_etl_code_spark.sources.registry import load_table

    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    o.write.partitionBy("o_year").mode("overwrite").parquet(path)
    po = spark.read.parquet(path)

    # (a) static: the literal year filter lands in PartitionFilters
    static = po.filter(F.col("o_year") == 1995).select("o_orderkey")
    static_plan = static._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in static_plan and "o_year" in static_plan
    assert static.count() == o.filter(F.col("o_year") == 1995).count()

    # (b) dynamic: joining to a filtered dim injects a runtime pruning
    # subquery on the partition column
    dim = spark.createDataFrame(
        [(1995, "target")], "o_year INT, tag STRING"
    ).filter(F.col("tag") == "target")
    joined = po.join(dim, "o_year")
    jplan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in jplan.lower(), jplan[:2000]
    assert joined.count() == o.filter(F.col("o_year") == 1995).count()


def test_q19_disjunction_factored_to_both_scans(spark, sf_dir):
    """The OR-of-ANDs predicate must not stay a post-join filter: Catalyst
    factors per-side disjunctions and parquet receives them as pushed
    filters on BOTH scans (part gets the brand/size OR, lineitem the
    quantity OR) — at 100 TB that's the difference between scanning three
    narrow bands and scanning the whole fact table."""
    plan = _plan(spark, sf_dir, "q19_disjunctive_revenue")
    import re

    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    part_side = [p for p in pushed if "p_brand" in p]
    li_side = [p for p in pushed if "l_quantity" in p]
    assert part_side and "Or(" in part_side[0] and "Brand#1" in part_side[0]
    assert li_side and "Or(" in li_side[0]


def test_q4_exists_compiles_to_semi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q4_priority_with_returns")
    assert "LeftSemi" in plan
    # the fan-out join must not materialize matched lineitem columns
    assert "l_extendedprice" not in plan


def test_q16_not_in_is_broadcast_anti(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q16_supplier_diversity")
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan


def test_q22_threshold_is_single_row_broadcast(spark, sf_dir):
    """The scalar threshold must broadcast (nested-loop over 1 row), and
    the dormancy check must be an anti join — not a full outer shape."""
    plan = _plan(spark, sf_dir, "q22_dormant_accounts")
    assert "BroadcastNestedLoopJoin" in plan and "LeftAnti" in plan


def test_q21_self_exists_is_one_aggregate_not_self_join(spark, sf_dir):
    """The EXISTS ∧ NOT-EXISTS pair must compile to ONE per-order
    aggregate joined back — never two quadratic fact self-joins. The
    plan therefore contains exactly 3 lineitem scans' worth of joins but
    no join whose BOTH sides are unaggregated lineitem."""
    plan = _plan(spark, sf_dir, "q21_sole_fault_supplier")
    # the sole-fault attribution predicate lives in aggregate form
    # (countDistinct expands to the gid/Expand two-phase plan)
    assert "n_supp" in plan and "n_ret_supp" in plan
    # no cartesian / nested-loop fact pairing
    assert "CartesianProduct" not in plan


def test_q20_part_prefix_filter_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q20_volume_shippers")
    assert "StringStartsWith(p_name,s)" in plan.replace(" ", "").replace(
        "'", ""
    ) or "StartsWith(p_name, s)" in plan
    assert "LeftSemi" in plan


def test_q17_correlated_avg_is_broadcast_agg_join(spark, sf_dir):
    """The decorrelated per-part AVG must come back as a broadcast side
    (per-part agg output ≪ fact), and the brand filter must reach both
    part scans."""
    plan = _plan(spark, sf_dir, "q17_small_quantity_revenue")
    assert "BroadcastHashJoin" in plan
    assert plan.count("EqualTo(p_brand,Brand#3)") == 2


def test_q2_min_subquery_is_broadcast_agg_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q2_min_cost_supplier")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_incremental_dedup_never_shuffles_corpus(spark, sf_dir):
    """Every join in dedup_incremental broadcasts the (small) batch side:
    the corpus must appear only under broadcast joins, never a
    SortMergeJoin / ShuffledHashJoin — the property that makes per-batch
    dedup O(batch), not O(corpus), at 100 TB."""
    plan = _plan(spark, sf_dir, "dedup_incremental")
    assert "BroadcastHashJoin" in plan
    # any remaining Exchange is over batch-bounded data (candidate pairs,
    # dropped ids) — corpus-sized data reaches only broadcast joins
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_quantize_entry_is_shuffle_free(spark, sf_dir):
    """int8 quantization is a pure narrow map — zero exchanges."""
    plan = _plan(spark, sf_dir, "embedding_quantize_int8")
    assert "Exchange" not in plan


def test_runtime_bloom_filter_injected_on_selective_join(spark, sf_dir):
    """Runtime row-level filtering: a selective dimension predicate
    injects a bloom_filter_agg that prunes fact rows BEFORE the join
    shuffle — at 100 TB this is the difference between shuffling the
    whole fact table and shuffling the ~selectivity fraction."""
    from pyspark.sql import functions as F  # noqa: F401

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_weighted_sample_uses_take_ordered(spark, sf_dir):
    """Sequential Poisson sampling must be a TakeOrdered top-k — never a
    global sort of the corpus."""
    plan = _plan(spark, sf_dir, "weighted_sample_docs")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") <= 1  # only the top-k gather


def test_corpus_entries_read_from_shared_cache(spark, sf_dir):
    """The three heavy corpus entries must run from the session-cached
    enriched frame (plans/shared_cache.py), not re-tokenize documents.
    The artifact leaf is strategy-dependent (plans/artifacts.py):
    ``checkpoint`` truncates the lineage to a LogicalRDD (plans read
    ``Scan ExistingRDD``), ``memory`` persists (plans read
    ``InMemoryTableScan``). Either way the tokenization lineage — the
    35-lambda MinHash signature build — must NOT appear in the plan."""
    from hpv_etl_code_spark.plans.artifacts import stage_storage
    from hpv_etl_code_spark.plans.shared_cache import enriched_documents

    enriched_documents(spark, sf_dir).count()  # materialize the cache
    leaf = {
        "checkpoint": "Scan ExistingRDD",
        "memory": "InMemoryTableScan",
        "parquet": "Scan parquet",
    }.get(stage_storage(spark))
    assert leaf is not None, "tests expect a materializing artifact strategy"
    for name in ("dedup_minhash_lsh", "llm_corpus_pipeline", "dedup_incremental_fast"):
        assert leaf in _plan(spark, sf_dir, name), name


# ----- round-3 temporal/graph/sketch entries -----


def test_interval_containment_is_banded_equi_join(spark, sf_dir):
    """The point-in-interval join must compile to a hash EQUI join on
    the time bucket — never BroadcastNestedLoopJoin/CartesianProduct
    (what a naive non-equi theta join falls back to)."""
    plan = _plan(spark, sf_dir, "interval_containment_join")
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan  # the banded equi join survives


def test_sessionize_single_exchange(spark, sf_dir):
    """lag window + running session counter + per-session aggregate all
    cluster by user_id: Catalyst must plan exactly ONE hash exchange."""
    df = catalog.entries()["sessionize_events"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_triangles_no_nested_loop(spark, sf_dir):
    """Oriented-edge triangle enumeration is equi-joins all the way
    down; the two scalar counts union instead of cross-joining."""
    from hpv_etl_code_spark.plans.lint import assert_scalable

    df = catalog.entries()["copurchase_triangles"].fn(spark, sf_dir)
    assert_scalable(df)


def test_cms_probe_side_is_broadcast(spark, sf_dir):
    """The 64-row probe set must broadcast onto the sketch counters —
    the 1 KB sketch and the probe list are both metadata-sized, and the
    one real exchange is the counter aggregation over the fact."""
    plan = _plan(spark, sf_dir, "cms_frequency_portable")
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_pq_corpus_never_shuffles_before_topk(spark, sf_dir):
    """PQ ADC scoring: the encoded corpus is a narrow map (broadcast
    codebook, broadcast query ADC tables); the ONLY hash exchange is
    the per-query top-k window."""
    df = catalog.entries()["ann_pq_topk"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_lateral_subquery_is_decorrelated(spark, sf_dir):
    """The correlated LATERAL LIMIT subquery must compile to ONE join
    over a per-key window (WindowGroupLimit-pruned) — never a
    per-outer-row re-execution or nested loop."""
    plan = _plan(spark, sf_dir, "lateral_topk_orders")
    assert "Window" in plan
    assert plan.count("Join") >= 1
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "WindowGroupLimit" in plan  # LIMIT pushed into the window


def test_interval_union_single_exchange(spark, sf_dir):
    """Interval-merge windows and both aggregations cluster by user_id:
    exactly ONE hash exchange for the whole chain."""
    df = catalog.entries()["interval_union_length"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_interval_union_merges_touching_spans(spark, tmp_path):
    """Overlap and touch merge; a gap opens a new span: events at
    t=0, 300, 1200 with 600 s intervals give spans [0,900) and
    [1200,1800) — 2 spans, 1500 covered seconds."""
    import datetime as dt

    from pyspark.sql import Row

    from hpv_etl_code_spark.plans.temporal_graph_queries import (
        interval_union_length,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(event_id=i, ts=base + dt.timedelta(seconds=s), user_id=1,
            event_type="x", value=1.0, props="{}")
        for i, s in enumerate((0, 300, 1200))
    ]
    # touching case: second user with events at exactly 600 s apart
    rows += [
        Row(event_id=10 + i, ts=base + dt.timedelta(seconds=s), user_id=2,
            event_type="x", value=1.0, props="{}")
        for i, s in enumerate((0, 600))
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "events.parquet"))
    got = {r.user_id: r for r in interval_union_length(spark, str(tmp_path)).collect()}
    assert (got[1].n_spans, got[1].covered_secs) == (2, 1500)
    assert (got[2].n_spans, got[2].covered_secs) == (1, 1200)


@pytest.mark.parametrize(
    ("entry", "n_pins"),
    [("knn_graph", 2), ("embedding_neardup_blocked", 2), ("copurchase_triangles", 3)],
)
def test_fanout_join_inputs_keep_pinned_partition_counts(spark, sf_dir, entry, n_pins):
    """Regression guard for the AQE fan-out pathology found in the sf1
    sweep: high-fan-out join inputs (block pairs, triangle wedges) must
    keep their EXPLICIT partition counts — REPARTITION_BY_NUM is exempt
    from AQE coalescing, a bare repartition is not. Losing a pin
    re-opens the quadratic-output-into-three-partitions failure
    (>560 s measured at 20k vectors)."""
    df = catalog.entries()[entry].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("REPARTITION_BY_NUM") >= n_pins, entry


def test_runtime_bloom_filter_injected(spark, sf_dir):
    """Spark's runtime bloom-filter join pruning — the engine-native
    analog of the portable bloom_semijoin_portable entry: with the
    optimizer flag on and a shuffle join, the fact side's scan gains a
    might_contain(bloom_filter_agg(dim keys)) filter, dropping
    non-matching rows BEFORE the shuffle. Conf overrides are scoped and
    restored."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prior = {}
    for k, v in confs.items():
        try:
            prior[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset conf
            prior[k] = None
        spark.conf.set(k, v)
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
            F.col("c_acctbal") > 9000
        )
        j = orders.join(cust, orders.o_custkey == cust.c_custkey)
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q15_view_computed_once(spark, sf_dir):
    """Q15's revenue view must be computed ONCE: exactly one lineitem
    scan (the MAX rides a window over the aggregate, not a second
    aggregation of a re-aliased subtree), and the supplier lookup stays
    broadcast."""
    plan = _plan(spark, sf_dir, "q15_top_supplier")
    assert plan.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_session4_stats_joins_stay_broadcast(spark, sf_dir):
    """The session-4 statistics entries join metadata-sized aggregates
    (margins, totals, q-hat tables) back to cell/row frames — every one
    must be a broadcast, never a fact-sized SortMergeJoin."""
    for name in (
        "chi_square_independence",
        "permutation_test_cents",
        "logrank_test_userlife",
        "conformal_interval_cents",
        "acf_daily_cents",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "SortMergeJoin" not in plan, name


def test_holt_chunk_agg_reuses_user_partitioning(spark, sf_dir):
    """The segmented Holt fold must shuffle ONCE on user_id: the rn
    window, the (user_id, cid) chunk aggregation and the per-user
    compose all cluster by the user hash — count the exchanges."""
    plan = _plan(spark, sf_dir, "holt_linear_trend")
    import re

    # scan-side exchanges: one hashpartitioning(user_id...) for the
    # window/fold chain; the seeds aggregate reuses it (join adds a
    # broadcast, not a shuffle, or one more hash exchange at most)
    n_exchange = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchange <= 2, f"{n_exchange} hash exchanges:\n{plan[:2000]}"


def test_kaplan_meier_is_two_aggregates(spark, sf_dir):
    """KM = subjects aggregation (the only full pass) + calendar-bounded
    curve windows; no join against the raw table may appear."""
    plan = _plan(spark, sf_dir, "kaplan_meier_userlife")
    assert "SortMergeJoin" not in plan
    # one user aggregation + one (stratum, t) aggregation feed windows
    # (each scan prints once in the tree and once in the details, so
    # count the per-scan Location lines)
    assert plan.count("Location: InMemoryFileIndex") == 1, (
        "events must be read once"
    )
