"""Model-evaluation entries (round 5, session 3): exact AUC via the
Mann–Whitney rank-sum and a decile lift/gains table — the two readouts
every training-data pipeline runs on a scored validation set. The
"score" here is the events value column and the "label" is
event_type = 'purchase' (a deterministic stand-in with realistic class
balance); the machinery is score/label-agnostic.

Determinism contract: tied-score groups get their exact average rank
((min+max)/2 — a .5-exact double), rank sums ride DECIMAL(20,8), and
each output float is one fixed division rounded to 6dp, mirrored
verbatim in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.layout import global_row_index
from ..sources.registry import load_table

_LIFT_BUCKETS = 10


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
        "event_id",
    )


def auc_purchase_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of score→label via the Mann–Whitney identity
    AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻), where R⁺ is the positive
    class's rank sum under MIDRANKS for ties — bit-reproducible because
    a tie group's average rank (min+max)/2 is exact in binary floats
    and the rank sum aggregates through exact decimals. One ordered
    pass, no pairwise expansion (the naive AUC join is n⁺·n⁻ pairs —
    quadratic; the rank form is sort + two aggregates).

    Scale: the cumulative rank count over distinct scores is a
    ``global_prefix_sum`` (two-phase bucketed — no single-partition
    sort even when the score domain is data-sized; ADVICE r5 killed
    the last bare ``ORDER BY`` windows in this module), the midrank
    adjustment is a (score)-keyed aggregation, and everything
    downstream is a 1-row summary. At 100 TB the same identity runs on
    a quantized-score histogram (65k buckets) with identical math.
    """
    from ..operators.layout import global_prefix_sum

    s = _scored(spark, sf_dir)
    # midrank per distinct score: ranks occupied are [rk, rk+cnt-1]
    per_score = s.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("label").cast("bigint").alias("pos"),
    )
    # score is unique post-groupBy → the prefix order is deterministic
    ranked = global_prefix_sum(
        per_score, key="score", weight="cnt", cum_col="cum"
    ).withColumn(
        "midrank",
        (
            (F.col("cum") - F.col("cnt") + 1).cast("double")
            + F.col("cum").cast("double")
        )
        / F.lit(2.0),
    )
    agg = ranked.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos")).cast("bigint").alias("n_neg"),
        F.sum(
            (F.col("pos").cast("double") * F.col("midrank")).cast(
                "decimal(20,8)"
            )
        )
        .cast("double")
        .alias("rank_sum_pos"),
    )
    npos = F.col("n_pos").cast("double")
    nneg = F.col("n_neg").cast("double")
    auc = (
        F.col("rank_sum_pos") - npos * (npos + 1.0) / 2.0
    ) / (npos * nneg)
    return agg.select(
        "n_pos",
        "n_neg",
        F.round("rank_sum_pos", 6).alias("rank_sum_pos"),
        F.round(auc, 6).alias("auc"),
    )


AUC_SQL = """
WITH s AS (
  SELECT (CAST(value AS DECIMAL(12,2)) * 100)::BIGINT AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
), per_score AS (
  SELECT score, COUNT(*)::BIGINT AS cnt, SUM(label)::BIGINT AS pos
  FROM s GROUP BY 1
), ranked AS (
  SELECT pos, cnt,
    ((SUM(cnt) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) - cnt + 1)::DOUBLE
     + (SUM(cnt) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING))::DOUBLE)
      / 2.0 AS midrank
  FROM per_score
), agg AS (
  SELECT SUM(pos)::BIGINT AS n_pos,
         (SUM(cnt) - SUM(pos))::BIGINT AS n_neg,
         CAST(CAST(SUM(CAST(pos::DOUBLE * midrank AS DECIMAL(20,8)))
              AS VARCHAR) AS DOUBLE) AS rank_sum_pos
  FROM ranked
)
SELECT n_pos, n_neg,
  ROUND(rank_sum_pos, 6) AS rank_sum_pos,
  ROUND((rank_sum_pos - n_pos::DOUBLE * (n_pos::DOUBLE + 1.0) / 2.0)
        / (n_pos::DOUBLE * n_neg::DOUBLE), 6) AS auc
FROM agg
"""


def decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gains table: rows ranked by score descending are cut
    into 10 equal-population buckets (INTEGER arithmetic —
    bucket = ((rank−1)·10) DIV n, no ntile ambiguity, ties broken by
    event_id so both engines cut identically), and each bucket reports
    its positive rate, lift vs the base rate, and cumulative gain —
    the campaign-targeting readout.

    Scale: ranks come from the two-phase bucketed scheme
    (``global_row_index`` on the NEGATED score — ADVICE r5: the former
    bare ``row_number() OVER (ORDER BY ...)`` planned as Exchange
    SinglePartition, the one-task global sort layout.py exists to
    avoid; plan-asserted in tests/test_mleval_plans.py), then one
    10-group aggregation and a broadcast 1-row base rate. The
    cumulative columns run over 10 metadata rows.
    """
    s = _scored(spark, sf_dir)
    n1 = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("label").cast("bigint").alias("__p"),
    )
    # rank DESC by score = rank ASC by -score (scores are non-null
    # exact cents; ties broken by event_id in both engines)
    ranked = global_row_index(
        s.withColumn("negscore", -F.col("score")),
        key="negscore",
        tiebreak=("event_id",),
        index_col="rk",
    ).drop("negscore")
    bucketed = (
        ranked.join(F.broadcast(n1))
        .withColumn(
            "decile",
            F.expr(f"((rk - 1) * {_LIFT_BUCKETS}) DIV __n").cast("bigint"),
        )
    )
    per = bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("label").cast("bigint").alias("n_pos"),
        F.max("__n").alias("__n"),
        F.max("__p").alias("__p"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rate = F.col("n_pos").cast("double") / F.col("n_rows").cast("double")
    base = F.col("__p").cast("double") / F.col("__n").cast("double")
    cum_pos = F.sum("n_pos").over(wc)
    return per.select(
        "decile",
        "n_rows",
        "n_pos",
        F.round(rate, 6).alias("pos_rate"),
        F.round(rate / base, 6).alias("lift"),
        F.round(
            cum_pos.cast("double") / F.col("__p").cast("double"), 6
        ).alias("cum_gain"),
    )


LIFT_SQL = f"""
WITH s AS (
  SELECT (CAST(value AS DECIMAL(12,2)) * 100)::BIGINT AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
         event_id
  FROM events
), n1 AS (
  SELECT COUNT(*)::BIGINT AS n, SUM(label)::BIGINT AS p FROM s
), bucketed AS (
  SELECT label, n, p,
    ((row_number() OVER (ORDER BY score DESC, event_id) - 1)
      * {_LIFT_BUCKETS}) // n AS decile
  FROM s CROSS JOIN n1
), per AS (
  SELECT decile::BIGINT AS decile, COUNT(*)::BIGINT AS n_rows,
         SUM(label)::BIGINT AS n_pos, MAX(n) AS n, MAX(p) AS p
  FROM bucketed GROUP BY 1
)
SELECT decile, n_rows, n_pos,
  ROUND(n_pos::DOUBLE / n_rows::DOUBLE, 6) AS pos_rate,
  ROUND((n_pos::DOUBLE / n_rows::DOUBLE) / (p::DOUBLE / n::DOUBLE), 6)
    AS lift,
  ROUND((SUM(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING))::DOUBLE
        / p::DOUBLE, 6) AS cum_gain
FROM per
"""


# ------------------------------------------------------------- nDCG@k

_NDCG_K = 10


def ndcg_user_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of a spend-based user ranking per event_type: for each
    type, users are ranked by total cents spent (the "model score",
    ties broken by user_id) and judged against graded relevance =
    event count (the "engagement label"); nDCG@10 compares the
    score-ordered DCG against the ideal relevance-ordered DCG — the
    ranking-quality readout of the eval trio (AUC = classification,
    lift = targeting, nDCG = ranking).

    Determinism: relevance and rank are integers; each DCG term is one
    division by the literal log2(i+1) with i ≤ 10, summed through
    DECIMAL(20,8); ndcg is one final division. Ideal ranking ties
    break on user_id in both engines.

    Scale: one (type, user) aggregation, two top-10 rank windows over
    it (WindowGroupLimit prunes to 10 rows per type before the sort
    completes), and a type-sized final join — nothing touches raw
    events twice.
    """
    import math

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(
            (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
        ).alias("spend"),
        F.count(F.lit(1)).cast("bigint").alias("rel"),
    )
    w_score = Window.partitionBy("event_type").orderBy(
        F.col("spend").desc(), F.col("user_id")
    )
    w_ideal = Window.partitionBy("event_type").orderBy(
        F.col("rel").desc(), F.col("user_id")
    )
    ranked = per_user.select(
        "event_type",
        "rel",
        F.row_number().over(w_score).alias("rk_s"),
        F.row_number().over(w_ideal).alias("rk_i"),
    )
    # literal 1/log2(i+1) discounts — the identical doubles in both
    # engines (log2 of small ints is exact enough to be reproducible:
    # the literal is computed HERE and inlined into the SQL twin too)
    disc = {i: 1.0 / math.log2(i + 1) for i in range(1, _NDCG_K + 1)}
    dcg_term = F.col("rel").cast("double") * F.element_at(
        F.array(*[F.lit(disc[i]) for i in range(1, _NDCG_K + 1)]),
        F.col("rk_s"),
    )
    idcg_term = F.col("rel").cast("double") * F.element_at(
        F.array(*[F.lit(disc[i]) for i in range(1, _NDCG_K + 1)]),
        F.col("rk_i"),
    )
    agg = (
        ranked.filter(
            (F.col("rk_s") <= _NDCG_K) | (F.col("rk_i") <= _NDCG_K)
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("rk_s") <= _NDCG_K, dcg_term)
                .otherwise(0.0)
                .cast("decimal(20,8)")
            )
            .cast("double")
            .alias("dcg"),
            F.sum(
                F.when(F.col("rk_i") <= _NDCG_K, idcg_term)
                .otherwise(0.0)
                .cast("decimal(20,8)")
            )
            .cast("double")
            .alias("idcg"),
        )
    )
    return agg.select(
        "event_type",
        F.round("dcg", 6).alias("dcg_at_10"),
        F.round("idcg", 6).alias("idcg_at_10"),
        F.round(
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")), 6
        ).alias("ndcg_at_10"),
    )


def _ndcg_sql() -> str:
    import math

    disc_list = ", ".join(
        repr(1.0 / math.log2(i + 1)) for i in range(1, _NDCG_K + 1)
    )
    return f"""
WITH per_user AS (
  SELECT event_type, user_id,
         SUM((CAST(value AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT AS spend,
         COUNT(*)::BIGINT AS rel
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT event_type, rel,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY spend DESC, user_id) AS rk_s,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY rel DESC, user_id) AS rk_i
  FROM per_user
), agg AS (
  SELECT event_type,
    CAST(CAST(SUM(CAST(CASE WHEN rk_s <= {_NDCG_K}
          THEN rel::DOUBLE * ([{disc_list}])[rk_s] ELSE 0.0 END
          AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS dcg,
    CAST(CAST(SUM(CAST(CASE WHEN rk_i <= {_NDCG_K}
          THEN rel::DOUBLE * ([{disc_list}])[rk_i] ELSE 0.0 END
          AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS idcg
  FROM ranked
  WHERE rk_s <= {_NDCG_K} OR rk_i <= {_NDCG_K}
  GROUP BY 1
)
SELECT event_type,
  ROUND(dcg, 6) AS dcg_at_10,
  ROUND(idcg, 6) AS idcg_at_10,
  ROUND(CASE WHEN idcg > 0 THEN dcg / idcg END, 6) AS ndcg_at_10
FROM agg
"""


# ------------------------------------------------- PR curve / calibration


def pr_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 at ten operating points — the score-ranked
    rows are cut at each decile boundary (same integer bucket rule as
    `decile_lift_table`, ties broken by event_id) and each cut reports
    the confusion counts for "predict positive above the cut":
    TP/FP/FN are exact integers from ONE cumulative window over ten
    bucket aggregates; precision/recall/F1 are single double divisions.

    Scale: ranks via ``global_row_index`` on the negated score (no
    single-partition sort — ADVICE r5, plan-asserted in
    tests/test_mleval_plans.py), one 10-group aggregation; the
    cumulative confusion counts and ratios run over 10 metadata rows.
    """
    s = _scored(spark, sf_dir)
    n1 = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("label").cast("bigint").alias("__p"),
    )
    ranked = global_row_index(
        s.withColumn("negscore", -F.col("score")),
        key="negscore",
        tiebreak=("event_id",),
        index_col="rk",
    ).drop("negscore")
    per = (
        ranked.join(F.broadcast(n1))
        .withColumn(
            "decile",
            F.expr(f"((rk - 1) * {_LIFT_BUCKETS}) DIV __n").cast("bigint"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("label").cast("bigint").alias("n_pos"),
            F.max("__p").alias("__p"),
        )
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "decile",
        "__p",
        F.sum("n_rows").over(wc).alias("n_pred_pos"),
        F.sum("n_pos").over(wc).alias("tp"),
    )
    precision = F.col("tp").cast("double") / F.col("n_pred_pos").cast("double")
    recall = F.col("tp").cast("double") / F.col("__p").cast("double")
    f1 = (
        F.lit(2.0)
        * F.col("tp").cast("double")
        / (F.col("n_pred_pos") + F.col("__p")).cast("double")
    )
    return cum.select(
        "decile",
        "n_pred_pos",
        "tp",
        (F.col("n_pred_pos") - F.col("tp")).alias("fp"),
        (F.col("__p") - F.col("tp")).alias("fn"),
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


PR_CURVE_SQL = f"""
WITH s AS (
  SELECT (CAST(value AS DECIMAL(12,2)) * 100)::BIGINT AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
         event_id
  FROM events
), n1 AS (
  SELECT COUNT(*)::BIGINT AS n, SUM(label)::BIGINT AS p FROM s
), per AS (
  SELECT ((row_number() OVER (ORDER BY score DESC, event_id) - 1)
          * {_LIFT_BUCKETS}) // n AS decile,
         label, p
  FROM s CROSS JOIN n1
), agg AS (
  SELECT decile::BIGINT AS decile, COUNT(*)::BIGINT AS n_rows,
         SUM(label)::BIGINT AS n_pos, MAX(p) AS p
  FROM per GROUP BY 1
), cum AS (
  SELECT decile, p,
    SUM(n_rows) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)::BIGINT
      AS n_pred_pos,
    SUM(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)::BIGINT AS tp
  FROM agg
)
SELECT decile, n_pred_pos, tp,
  (n_pred_pos - tp)::BIGINT AS fp,
  (p - tp)::BIGINT AS fn,
  ROUND(tp::DOUBLE / n_pred_pos::DOUBLE, 6) AS precision,
  ROUND(tp::DOUBLE / p::DOUBLE, 6) AS recall,
  ROUND(2.0 * tp::DOUBLE / (n_pred_pos + p)::DOUBLE, 6) AS f1
FROM cum
"""


_CAL_BINS = 10


def calibration_bins_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration reliability table + Brier score/ECE summary for a
    rank-calibrated score: predicted probability p = (rank−1)/(n−1)
    (the percent-rank transform — rank ascending by score, ties broken
    by event_id so both engines assign identical p), binned into ten
    reliability buckets. Per-bin rows report mean predicted p vs the
    observed positive rate and the |gap|; the bin = −1 summary row
    reports the Brier score (mean (p−y)²), the base rate, and ECE
    (Σ nᵇ/N·|gap|) in the same columns (the fold = −1 convention from
    `fold_assignment_leakfree`).

    Determinism: p is ONE double division of exact integers, (p−y)² is
    IEEE multiply of that double, per-row terms sum through
    DECIMAL(20,8), every ratio is a single final division rounded 6dp.

    Scale: ranks via ``global_row_index`` (ascending score — no
    single-partition sort, ADVICE r5, plan-asserted in
    tests/test_mleval_plans.py), one 10-group aggregation, a 1-row
    summary — same shape as the AUC entry.
    """
    s = _scored(spark, sf_dir)
    n1 = s.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    p = (F.col("rk") - 1).cast("double") / (F.col("__n") - 1).cast("double")
    ranked = global_row_index(
        s, key="score", tiebreak=("event_id",), index_col="rk"
    )
    tagged = (
        ranked.join(F.broadcast(n1))
        .withColumn("p", p)
        .withColumn(
            "bin",
            F.least(
                F.floor(F.col("p") * _CAL_BINS).cast("bigint"),
                F.lit(_CAL_BINS - 1).cast("bigint"),
            ),
        )
    )
    sq = (F.col("p") - F.col("label").cast("double")) * (
        F.col("p") - F.col("label").cast("double")
    )
    per_bin = tagged.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("label").cast("bigint").alias("n_pos"),
        F.sum(F.col("p").cast("decimal(20,8)")).alias("sum_p"),
        F.sum(sq.cast("decimal(20,8)")).alias("sum_sq"),
    )
    avg_p = F.col("sum_p").cast("double") / F.col("n_rows").cast("double")
    pos_rate = F.col("n_pos").cast("double") / F.col("n_rows").cast("double")
    bins = per_bin.select(
        "bin",
        "n_rows",
        F.round(avg_p, 6).alias("avg_pred"),
        F.round(pos_rate, 6).alias("pos_rate"),
        F.round(F.abs(avg_p - pos_rate), 6).alias("abs_gap"),
        "sum_sq",
        "n_pos",
        (
            F.abs(avg_p - pos_rate).cast("decimal(20,8)")
            * F.col("n_rows").cast("decimal(18,0)")
        ).alias("gap_weight"),
    )
    summary = bins.agg(
        F.lit(-1).cast("bigint").alias("bin"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.round(
            F.sum("sum_sq").cast("double") / F.sum("n_rows").cast("double"), 6
        ).alias("avg_pred"),
        F.round(
            F.sum("n_pos").cast("double") / F.sum("n_rows").cast("double"), 6
        ).alias("pos_rate"),
        F.round(
            F.sum("gap_weight").cast("double") / F.sum("n_rows").cast("double"),
            6,
        ).alias("abs_gap"),
    )
    return bins.drop("sum_sq", "n_pos", "gap_weight").unionByName(summary)


def _calibration_sql() -> str:
    return f"""
WITH s AS (
  SELECT (CAST(value AS DECIMAL(12,2)) * 100)::BIGINT AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
         event_id
  FROM events
), n1 AS (SELECT COUNT(*)::BIGINT AS n FROM s),
tagged AS (
  SELECT label,
    (row_number() OVER (ORDER BY score, event_id) - 1)::DOUBLE
      / (n - 1)::DOUBLE AS p
  FROM s CROSS JOIN n1
), binned AS (
  SELECT least(floor(p * {_CAL_BINS})::BIGINT, {_CAL_BINS - 1}) AS bin,
         label, p, (p - label::DOUBLE) * (p - label::DOUBLE) AS sq
  FROM tagged
), per_bin AS (
  SELECT bin, COUNT(*)::BIGINT AS n_rows, SUM(label)::BIGINT AS n_pos,
         SUM(CAST(p AS DECIMAL(20,8))) AS sum_p,
         SUM(CAST(sq AS DECIMAL(20,8))) AS sum_sq
  FROM binned GROUP BY 1
), bins AS (
  SELECT bin, n_rows,
    ROUND(CAST(CAST(sum_p AS VARCHAR) AS DOUBLE) / n_rows::DOUBLE, 6)
      AS avg_pred,
    ROUND(n_pos::DOUBLE / n_rows::DOUBLE, 6) AS pos_rate,
    ROUND(abs(CAST(CAST(sum_p AS VARCHAR) AS DOUBLE) / n_rows::DOUBLE
              - n_pos::DOUBLE / n_rows::DOUBLE), 6) AS abs_gap,
    sum_sq, n_pos,
    CAST(abs(CAST(CAST(sum_p AS VARCHAR) AS DOUBLE) / n_rows::DOUBLE
             - n_pos::DOUBLE / n_rows::DOUBLE) AS DECIMAL(20,8))
      * n_rows::DECIMAL(18,0) AS gap_weight
  FROM per_bin
)
SELECT bin, n_rows, avg_pred, pos_rate, abs_gap FROM bins
UNION ALL
SELECT -1::BIGINT, SUM(n_rows)::BIGINT,
  ROUND(CAST(CAST(SUM(sum_sq) AS VARCHAR) AS DOUBLE)
        / SUM(n_rows)::DOUBLE, 6),
  ROUND(SUM(n_pos)::DOUBLE / SUM(n_rows)::DOUBLE, 6),
  ROUND(CAST(CAST(SUM(gap_weight) AS VARCHAR) AS DOUBLE)
        / SUM(n_rows)::DOUBLE, 6)
FROM bins
"""


# ------------------------------------------------- conformal intervals

_CONF_ALPHA_PCT = 90  # nominal coverage, percent


def conformal_interval_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals for event value (cents)
    with a per-event-type mean predictor: rows hash-split 3 ways
    (md5 mod 4: 0-1 train, 2 calibrate, 3 test), the predictor is the
    TRAIN half's per-type mean, q̂ is the ⌈(n_cal+1)·0.9⌉-th order
    statistic of calibration |residuals| (the finite-sample-valid
    conformal quantile — pure rank selection, no interpolation), and
    the TEST rows report empirical coverage of ŷ ± q̂ — the
    distribution-free uncertainty readout that completes the eval
    family (discrimination = AUC, calibration = Brier, uncertainty =
    conformal coverage).

    Determinism: the split is the md5 hash; residuals are |cents·n −
    sum|-scaled EXACT integers (the ÷n-free trick — comparing
    |r_i·n| ≥ |q̂·n| is the same order as comparing the rationals, so
    rank selection and coverage counting never touch a float);
    reported floats are single final divisions.

    Scale: three conditional aggregates over one pass (train sums);
    the per-type calibration rank comes from ``grouped_row_index``
    (two-phase bucketed — a bare ``row_number() OVER (PARTITION BY
    event_type ORDER BY ...)`` would sort each type's whole
    calibration half in ONE task, the few-large-groups killer); one
    broadcast of the |types|-row q̂ table, one test-half count — no
    joins wider than the type table. The rank-k selected r is
    deterministic even under (r, cents) ties: the k-th smallest r is a
    property of the sorted multiset, not the tie order.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        (
            F.conv(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("bigint")
            % 4
        ).alias("split"),
    )
    train = base.filter(F.col("split") <= 1).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train"),
        F.sum("cents").cast("bigint").alias("sum_train"),
    )
    # scaled residual: |cents·n_train − sum_train| is an exact integer
    # with the same ordering as |cents − mean|
    scaled_res = F.abs(
        F.col("cents") * F.col("n_train") - F.col("sum_train")
    )
    cal = (
        base.filter(F.col("split") == 2)
        .join(F.broadcast(train), "event_type")
        .withColumn("r", scaled_res)
    )
    cal_n = cal.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cal")
    )
    from ..operators.layout import grouped_row_index

    cal_ranked = grouped_row_index(
        cal, group="event_type", key="r", tiebreak=("cents",), index_col="rk"
    )
    qhat = (
        cal_ranked.join(F.broadcast(cal_n), "event_type")
        .filter(
            F.col("rk")
            == F.ceil(
                (F.col("n_cal") + 1) * _CONF_ALPHA_PCT / F.lit(100.0)
            ).cast("bigint")
        )
        .select("event_type", "n_cal", F.col("r").alias("q_scaled"))
    )
    test = (
        base.filter(F.col("split") == 3)
        .join(F.broadcast(train), "event_type")
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n_train").alias("n_train"),
            F.max("n_cal").alias("n_cal"),
            F.max("q_scaled").alias("q_scaled"),
            F.max("n_train").alias("__n"),
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum((scaled_res <= F.col("q_scaled")).cast("int"))
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    return test.select(
        "event_type",
        "n_train",
        "n_cal",
        "n_test",
        F.round(
            F.col("q_scaled").cast("double") / F.col("__n").cast("double"), 6
        ).alias("qhat_cents"),
        F.round(
            F.col("n_covered").cast("double") / F.col("n_test").cast("double"),
            6,
        ).alias("coverage"),
    )


CONFORMAL_SQL = f"""
WITH base AS (
  SELECT event_type,
    (CAST(value AS DECIMAL(12,2)) * 100)::BIGINT AS cents,
    ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT % 4 AS split
  FROM events
), train AS (
  SELECT event_type, COUNT(*)::BIGINT AS n_train,
         SUM(cents)::BIGINT AS sum_train
  FROM base WHERE split <= 1 GROUP BY 1
), cal AS (
  SELECT b.event_type, abs(b.cents * t.n_train - t.sum_train) AS r, b.cents
  FROM base b JOIN train t USING (event_type) WHERE b.split = 2
), cal_n AS (
  SELECT event_type, COUNT(*)::BIGINT AS n_cal FROM cal GROUP BY 1
), qhat AS (
  SELECT event_type, n_cal, r AS q_scaled
  FROM (
    SELECT c.event_type, n.n_cal, c.r,
      row_number() OVER (PARTITION BY c.event_type ORDER BY c.r, c.cents)
        AS rk
    FROM cal c JOIN cal_n n USING (event_type)
  ) WHERE rk = CAST(ceil((n_cal + 1) * {_CONF_ALPHA_PCT} / 100.0) AS BIGINT)
), test AS (
  SELECT b.event_type,
    MAX(t.n_train) AS n_train, MAX(q.n_cal) AS n_cal,
    MAX(q.q_scaled) AS q_scaled,
    COUNT(*)::BIGINT AS n_test,
    SUM(CASE WHEN abs(b.cents * t.n_train - t.sum_train) <= q.q_scaled
        THEN 1 ELSE 0 END)::BIGINT AS n_covered
  FROM base b JOIN train t USING (event_type) JOIN qhat q USING (event_type)
  WHERE b.split = 3 GROUP BY 1
)
SELECT event_type, n_train, n_cal, n_test,
  ROUND(q_scaled::DOUBLE / n_train::DOUBLE, 6) AS qhat_cents,
  ROUND(n_covered::DOUBLE / n_test::DOUBLE, 6) AS coverage
FROM test
"""


_ISO_BUCKETS = 10


def isotonic_calibration_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone) calibration of the score→label relationship —
    the pool-adjacent-violators fit over ten equal-population score
    deciles, computed via PAV's minimax characterization:
    fit(i) = max_{j≤i} min_{k≥i} mean(pool j..k). The industry-standard
    monotone recalibrator (the step after `calibration_bins_brier`
    DIAGNOSES miscalibration, this entry FIXES it); the fitted rate is
    non-decreasing in score decile by construction.

    Why minimax instead of the sequential merge loop: over B buckets the
    identity enumerates all O(B³) (j,i,k) triples — declarative joins +
    two grouped aggregations on ≤ B² metadata rows, no iteration, no
    driver loop — and yields EXACTLY the PAV solution. Pooled means are
    single double divisions of exact integer (Σpos, Σn) prefix
    differences; min/max over doubles are order-independent.

    Scale: deciles are cut from the ``global_row_index`` two-phase rank
    (operators/layout.py — range-bucketed parallel numbering, ties
    broken by event_id, NO single-partition sort; the naive
    ``row_number() OVER (ORDER BY score)`` measured 4.6× superlinear on
    the 10× scale rehearsal and this shape replaced it), one 10-group
    aggregate — the input never appears again; the triple expansion is
    10³ metadata rows.
    """
    from ..operators.layout import global_row_index

    s = _scored(spark, sf_dir)
    n1 = s.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    per = (
        global_row_index(s, key="score", tiebreak=("event_id",), index_col="rk")
        .join(F.broadcast(n1))
        .withColumn(
            "decile",
            F.expr(f"((rk - 1) * {_ISO_BUCKETS}) DIV __n + 1").cast("bigint"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("label").cast("bigint").alias("n_pos"),
        )
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "decile",
        "n_rows",
        "n_pos",
        F.sum("n_rows").over(wc).cast("bigint").alias("cn"),
        F.sum("n_pos").over(wc).cast("bigint").alias("cp"),
    ).select(
        "decile",
        "n_rows",
        "n_pos",
        "cn",
        "cp",
        (F.col("cn") - F.col("n_rows")).alias("bn"),
        (F.col("cp") - F.col("n_pos")).alias("bp"),
    )
    j, k, i = cum.alias("j"), cum.alias("k"), cum.alias("i")
    # pooled mean over deciles j..k (j ≤ k), one double division of
    # exact prefix-difference integers
    pooled = (
        j.join(F.broadcast(k), F.col("j.decile") <= F.col("k.decile"))
        .select(
            F.col("j.decile").alias("jd"),
            F.col("k.decile").alias("kd"),
            (
                (F.col("k.cp") - F.col("j.bp")).cast("double")
                / (F.col("k.cn") - F.col("j.bn")).cast("double")
            ).alias("mean_jk"),
        )
    )
    fit = (
        i.select(
            F.col("i.decile").alias("decile"),
            F.col("i.n_rows").alias("n_rows"),
            F.col("i.n_pos").alias("n_pos"),
        )
        .join(
            F.broadcast(pooled),
            (F.col("jd") <= F.col("decile")) & (F.col("kd") >= F.col("decile")),
        )
        .groupBy("decile", "n_rows", "n_pos", "jd")
        .agg(F.min("mean_jk").alias("__minmean"))
        .groupBy("decile", "n_rows", "n_pos")
        .agg(F.max("__minmean").alias("__fit"))
    )
    raw = F.col("n_pos").cast("double") / F.col("n_rows").cast("double")
    return fit.select(
        "decile",
        "n_rows",
        "n_pos",
        F.round(raw, 6).alias("raw_rate"),
        F.round("__fit", 6).alias("fit_rate"),
    )


ISOTONIC_SQL = f"""
WITH s AS (
  SELECT (CAST(value AS DECIMAL(12,2)) * 100)::BIGINT AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
         event_id
  FROM events
), n1 AS (
  SELECT COUNT(*)::BIGINT AS n FROM s
), per AS (
  SELECT ((ROW_NUMBER() OVER (ORDER BY score, event_id) - 1)
          * {_ISO_BUCKETS}) // (SELECT n FROM n1) + 1 AS decile,
         label
  FROM s
), agg AS (
  SELECT decile, COUNT(*)::BIGINT AS n_rows, SUM(label)::BIGINT AS n_pos
  FROM per GROUP BY decile
), cum AS (
  SELECT decile, n_rows, n_pos,
    SUM(n_rows) OVER (ORDER BY decile)::BIGINT AS cn,
    SUM(n_pos) OVER (ORDER BY decile)::BIGINT AS cp
  FROM agg
), cum2 AS (
  SELECT decile, n_rows, n_pos, cn, cp,
         cn - n_rows AS bn, cp - n_pos AS bp
  FROM cum
), pooled AS (
  SELECT j.decile AS jd, k.decile AS kd,
         (k.cp - j.bp)::DOUBLE / (k.cn - j.bn)::DOUBLE AS mean_jk
  FROM cum2 j JOIN cum2 k ON j.decile <= k.decile
), inner_min AS (
  SELECT i.decile, i.n_rows, i.n_pos, p.jd, MIN(p.mean_jk) AS minmean
  FROM cum2 i JOIN pooled p ON p.jd <= i.decile AND p.kd >= i.decile
  GROUP BY i.decile, i.n_rows, i.n_pos, p.jd
)
SELECT decile, n_rows, n_pos,
  ROUND(n_pos::DOUBLE / n_rows::DOUBLE, 6) AS raw_rate,
  ROUND(MAX(minmean), 6) AS fit_rate
FROM inner_min GROUP BY decile, n_rows, n_pos
"""


def register_entries(register) -> None:  # noqa: ANN001 — see catalog.register
    register(
        "isotonic_calibration_pav", isotonic_calibration_pav, ISOTONIC_SQL
    )
    register("auc_purchase_score", auc_purchase_score, AUC_SQL)
    register("decile_lift_table", decile_lift_table, LIFT_SQL)
    register("ndcg_user_ranking", ndcg_user_ranking, _ndcg_sql())
    register("pr_curve_deciles", pr_curve_deciles, PR_CURVE_SQL)
    register(
        "calibration_bins_brier", calibration_bins_brier, _calibration_sql()
    )
    register(
        "conformal_interval_cents", conformal_interval_cents, CONFORMAL_SQL
    )
