"""Invariant tests for plans/mleval_queries.py: rank-sum AUC vs the
naive pairwise definition, and lift-table conservation laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpv_etl_code_spark.plans import mleval_queries
from hpv_etl_code_spark.sources.registry import load_table


def test_auc_matches_pairwise_definition(spark, sf_dir):
    """AUC = P(score⁺ > score⁻) + ½·P(tie), computed naively over all
    (pos, neg) pairs on the driver — the rank-sum identity must agree
    to well inside the 6dp round."""
    row = mleval_queries.auc_purchase_score(spark, sf_dir).collect()[0]
    pdf = mleval_queries._scored(spark, sf_dir).toPandas()
    pos = sorted(pdf[pdf.label == 1].score.tolist())
    neg = sorted(pdf[pdf.label == 0].score.tolist())
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    import bisect

    wins = ties = 0
    for p in pos:
        lo = bisect.bisect_left(neg, p)
        hi = bisect.bisect_right(neg, p)
        wins += lo
        ties += hi - lo
    naive = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(row.auc - naive) < 1e-6
    assert 0.0 <= row.auc <= 1.0


def test_lift_table_conservation(spark, sf_dir):
    rows = sorted(
        mleval_queries.decile_lift_table(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(10))
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    p = ev.filter(F.col("event_type") == "purchase").count()
    assert sum(r.n_rows for r in rows) == n
    assert sum(r.n_pos for r in rows) == p
    # equal-population cut: bucket sizes differ by at most 1
    sizes = [r.n_rows for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # cumulative gain ends at exactly 1
    assert abs(rows[-1].cum_gain - 1.0) < 1e-9
    # lift · base_rate == pos_rate (consistency at 6dp)
    base = p / n
    for r in rows:
        assert abs(r.lift * base - r.pos_rate) < 5e-6, r


def test_touch_attribution_conservation_and_reference(spark, sf_dir):
    """Each model's credits sum to the purchase count, and the banded
    join reproduces a driver-side sequential reference."""
    from hpv_etl_code_spark.plans.behavior_queries import (
        _ATTR_WINDOW_US,
        touch_attribution,
    )

    rows = touch_attribution(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"),
    ).toPandas()
    purchases = ev[ev.event_type == "purchase"]
    from collections import Counter

    first_c, last_c = Counter(), Counter()
    touches = ev[ev.event_type != "purchase"]
    by_user = {u: g.sort_values(["us", "event_id"]) for u, g in touches.groupby("user_id")}
    for _, p in purchases.iterrows():
        g = by_user.get(p.user_id)
        w = None if g is None else g[(g.us >= p.us - _ATTR_WINDOW_US) & (g.us < p.us)]
        if w is None or len(w) == 0:
            first_c["(none)"] += 1
            last_c["(none)"] += 1
        else:
            first_c[w.iloc[0].event_type] += 1
            last_c[w.iloc[-1].event_type] += 1
    got_first = {r.channel: r.n_conversions for r in rows if r.model == "first"}
    got_last = {r.channel: r.n_conversions for r in rows if r.model == "last"}
    assert got_first == dict(first_c)
    assert got_last == dict(last_c)
    n_p = len(purchases)
    assert sum(got_first.values()) == n_p and sum(got_last.values()) == n_p


def test_t_closeness_reference(spark, sf_dir):
    """Per-class TVD vs a pandas reference (zero-filled domain), and
    threshold monotonicity: higher t_max never flags more classes."""
    from hpv_etl_code_spark.plans.governance_queries import (
        t_closeness_census,
    )

    rows = sorted(
        t_closeness_census(spark, sf_dir).collect(), key=lambda r: r.t_max
    )
    viol = [r.n_violating_classes for r in rows]
    assert viol == sorted(viol, reverse=True)
    # all three thresholds see identical class totals and max_t
    assert len({(r.n_classes, r.max_t) for r in rows}) == 1
    # pandas reference for max_t
    pdf = load_table(spark, sf_dir, "customer").toPandas()
    pdf["bal_band"] = (pdf.c_acctbal / 1000).apply(
        lambda v: int(v // 1) if v >= 0 else -int(-v // 1) - (v % 1 != 0)
    )
    import math

    pdf["bal_band"] = pdf.c_acctbal.apply(lambda v: math.floor(v / 1000))
    n = len(pdf)
    g = pdf.c_mktsegment.value_counts().to_dict()
    max_t = 0.0
    for _, cls in pdf.groupby(["c_nationkey", "bal_band"]):
        ne = len(cls)
        cc = cls.c_mktsegment.value_counts().to_dict()
        t = 0.5 * sum(
            abs(cc.get(s, 0) / ne - g[s] / n) for s in g
        )
        max_t = max(max_t, t)
    assert abs(rows[0].max_t - max_t) < 1e-6


def test_ndcg_reference_and_bounds(spark, sf_dir):
    """nDCG@10 vs a pandas reference; 0 < ndcg <= 1 and idcg >= dcg."""
    import math

    from hpv_etl_code_spark.plans.mleval_queries import (
        _NDCG_K,
        ndcg_user_ranking,
    )

    rows = {r.event_type: r for r in ndcg_user_ranking(spark, sf_dir).collect()}
    assert rows
    pdf = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(
            F.sum(
                (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
            ).alias("spend"),
            F.count(F.lit(1)).alias("rel"),
        )
        .toPandas()
    )
    for et, g in pdf.groupby("event_type"):
        by_score = g.sort_values(
            ["spend", "user_id"], ascending=[False, True]
        ).rel.tolist()[:_NDCG_K]
        by_rel = g.sort_values(
            ["rel", "user_id"], ascending=[False, True]
        ).rel.tolist()[:_NDCG_K]
        dcg = sum(r / math.log2(i + 2) for i, r in enumerate(by_score))
        idcg = sum(r / math.log2(i + 2) for i, r in enumerate(by_rel))
        r = rows[et]
        assert abs(r.dcg_at_10 - dcg) < 1e-5, et
        assert abs(r.idcg_at_10 - idcg) < 1e-5, et
        assert r.idcg_at_10 >= r.dcg_at_10 - 1e-9
        assert 0.0 < r.ndcg_at_10 <= 1.0 + 1e-9
