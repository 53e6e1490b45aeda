"""Unit tests for operators/mlprims.py: the trained-classifier and PCA
primitives' learning behavior, exact partitioning-invariance (the
determinism contract the unrolled oracles rely on), and degenerate
inputs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hpv_etl_code_spark.operators import mlprims


def _separable(spark, n=400):
    """x1 separates y cleanly; x2 is noise-ish but deterministic."""
    return (
        spark.range(n)
        .select(
            (F.col("id") % 20 / 10.0 - 0.95).alias("x1"),
            ((F.col("id") * 7 % 13) / 13.0 - 0.5).alias("x2"),
        )
        .withColumn("y", F.when(F.col("x1") > 0, 1.0).otherwise(0.0))
    )


def test_logreg_learns_separable_data(spark):
    df = _separable(spark)
    w = mlprims.logreg_train(df, ["x1", "x2"], "y", iterations=30, lr=2.0)
    scored = mlprims.logreg_score(df, w, ["x1", "x2"])
    acc = (
        scored.select(
            F.avg(
                F.when(
                    (F.col("score") > 0.5) == (F.col("y") > 0.5), 1.0
                ).otherwise(0.0)
            ).alias("a")
        ).collect()[0]["a"]
    )
    assert acc > 0.95, (acc, w)
    assert w[1] > 0  # x1 is the positive signal


def test_logreg_partitioning_invariance_bitwise(spark):
    df = _separable(spark, 300)
    w1 = mlprims.logreg_train(df.repartition(1), ["x1", "x2"], "y", 5)
    w7 = mlprims.logreg_train(df.repartition(7), ["x1", "x2"], "y", 5)
    assert w1 == w7  # exact equality: decimal sums are order-independent


def test_logreg_multi_equals_per_class_training(spark):
    """The shared-scan multiclass trainer must produce BITWISE the same
    weights as training each class alone — the one-scan-per-round
    optimization cannot change a single ulp."""
    df = _separable(spark, 240).withColumn(
        "y2", F.when((F.col("x2") > 0) & (F.col("x1") < 0.3), 1.0).otherwise(0.0)
    )
    multi = mlprims.logreg_train_multi(df, ["x1", "x2"], ["y", "y2"], 4)
    solo_y = mlprims.logreg_train(df, ["x1", "x2"], "y", 4)
    solo_y2 = mlprims.logreg_train(df, ["x1", "x2"], "y2", 4)
    assert multi[0] == solo_y
    assert multi[1] == solo_y2


def test_logreg_empty_input_keeps_zero_weights(spark):
    df = _separable(spark).limit(0)
    w = mlprims.logreg_train(df, ["x1", "x2"], "y", 3)
    assert w == [0.0, 0.0, 0.0]


def test_rational_sigmoid_bounds_and_midpoint(spark):
    df = spark.range(1).select(
        *[
            mlprims.rational_sigmoid(F.lit(z)).alias(f"s{i}")
            for i, z in enumerate([-1e9, -1.0, 0.0, 1.0, 1e9])
        ]
    )
    r = df.collect()[0]
    vals = [r[f"s{i}"] for i in range(5)]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals[2] == 0.5
    assert vals == sorted(vals)  # monotone


def _anisotropic(spark, n=300, dim=4):
    """Vectors whose dominant variance direction is e0+e1 (normalized)."""
    t = F.col("id") / 10.0 - (300 / 20.0)
    noise = [((F.col("id") * (7 + j) % 17) / 17.0 - 0.5) * 0.1 for j in range(dim)]
    comps = [t + noise[0], t + noise[1]] + [noise[j] for j in range(2, dim)]
    return spark.range(n).select(F.array(*comps).alias("embedding"))


def test_pca_finds_dominant_direction(spark):
    df = _anisotropic(spark)
    fit = mlprims.pca_power_iteration(df, "embedding", 4, iterations=12)
    v = fit["v"]
    assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-12
    # dominant direction is (1,1,0,0)/sqrt(2)
    target = [1 / math.sqrt(2), 1 / math.sqrt(2), 0.0, 0.0]
    cos = abs(sum(a * b for a, b in zip(v, target)))
    assert cos > 0.99, (v, fit["eigval"])
    assert fit["eigval"] > 0


def test_pca_two_components_orthogonal_and_ordered(spark):
    df = _anisotropic(spark)
    fit = mlprims.pca_two_components(df, "embedding", 4, iterations=12)
    v1, v2 = fit["v"], fit["v2"]
    dot = abs(sum(a * b for a, b in zip(v1, v2)))
    assert dot < 1e-6, (v1, v2)  # deflation ⇒ orthogonal
    assert fit["eigval"] >= fit["eigval2"] > 0
    assert abs(math.sqrt(sum(x * x for x in v2)) - 1.0) < 1e-12


def test_pca_partitioning_invariance_bitwise(spark):
    df = _anisotropic(spark, 200)
    f1 = mlprims.pca_power_iteration(df.repartition(1), "embedding", 4, 3)
    f5 = mlprims.pca_power_iteration(df.repartition(5), "embedding", 4, 3)
    assert f1["mu"] == f5["mu"]
    assert f1["v"] == f5["v"]
    assert f1["eigval"] == f5["eigval"]


def test_pca_empty_and_constant_inputs(spark):
    df = _anisotropic(spark).limit(0)
    fit = mlprims.pca_power_iteration(df, "embedding", 4, 3)
    assert fit["n"] == 0 and fit["eigval"] == 0.0
    const = spark.range(50).select(
        F.array(*[F.lit(1.5)] * 4).alias("embedding")
    )
    fit_c = mlprims.pca_power_iteration(const, "embedding", 4, 3)
    assert fit_c["eigval"] == 0.0  # zero variance: degenerate, no crash
