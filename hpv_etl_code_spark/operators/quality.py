"""Data-quality checks and deterministic dataset splitting.

- :func:`data_quality_report` is the expectations-style gate every
  ingest pipeline runs before publishing: null checks, key uniqueness,
  referential integrity, range checks — each expressed as an aggregate
  or anti-join (one shuffle apiece, no collects), unioned into one
  (check_name, n_violations) report that CI can assert on.
- :func:`split_assign` gives every row a stable train/val/test label
  from a hash of its key — reproducible across retries, engines and
  cluster sizes (the property ``randomSplit`` does NOT have: its
  sampling is partition-order dependent). Uses the same
  portable-hash idiom as the epoch shuffle (first 15 hex digits of
  md5 → 60-bit int), so an independent engine assigns identical
  splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_DENOM = 1_000_000


def _portable_bucket(key: Column, denom: int = SPLIT_DENOM) -> Column:
    """Deterministic bucket in [0, denom) from a 60-bit md5 prefix."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return F.pmod(h, F.lit(denom))


def split_assign(
    df: DataFrame,
    key_col: str,
    val_frac: float = 0.05,
    test_frac: float = 0.05,
    split_col: str = "split",
) -> DataFrame:
    """Attach a stable 'train'/'val'/'test' label keyed on ``key_col``.

    Boundaries are integer bucket thresholds so the assignment is exact
    (no float compare): bucket < val·D → val; < (val+test)·D → test;
    else train. Narrow projection — no shuffle, no RNG state."""
    b = _portable_bucket(F.col(key_col))
    val_hi = int(val_frac * SPLIT_DENOM)
    test_hi = val_hi + int(test_frac * SPLIT_DENOM)
    return df.withColumn(
        split_col,
        F.when(b < val_hi, F.lit("val"))
        .when(b < test_hi, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def data_quality_report(
    df: DataFrame,
    not_null: tuple[str, ...] = (),
    unique_key: tuple[str, ...] = (),
    fk: tuple[tuple[str, DataFrame, str], ...] = (),
    ranges: tuple[tuple[str, float, float], ...] = (),
) -> DataFrame:
    """Violations per declared expectation, as (check_name, n_violations).

    - ``not_null``: columns that must have no NULLs (counted in ONE
      aggregation pass over the table, not per-column jobs).
    - ``unique_key``: column tuple that must be a key (groupBy + filter
      count>1 — one shuffle).
    - ``fk``: (local_col, parent_df, parent_col) triples; orphans found
      with a left-anti join (broadcast when the parent is dim-sized —
      Spark's size estimate decides).
    - ``ranges``: (col, lo, hi) closed-interval expectations, counted in
      the same single aggregation pass as the null checks.
    """
    spark = df.sparkSession
    aggs = []
    names: list[str] = []
    for c in not_null:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long"))
        names.append(f"not_null:{c}")
    for c, lo, hi in ranges:
        aggs.append(
            F.sum(
                F.when(
                    F.col(c).isNotNull() & ((F.col(c) < lo) | (F.col(c) > hi)), 1
                ).otherwise(0)
            ).cast("long")
        )
        names.append(f"range:{c}")
    parts: list[DataFrame] = []
    if aggs:
        one = df.agg(*[a.alias(f"v{i}") for i, a in enumerate(aggs)])
        structs = [
            F.struct(
                F.lit(nm).alias("check_name"), F.col(f"v{i}").alias("n_violations")
            )
            for i, nm in enumerate(names)
        ]
        parts.append(
            one.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
        )
    if unique_key:
        dup = (
            df.groupBy(*[F.col(c) for c in unique_key])
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("n_violations"))
            .select(
                F.lit(f"unique:{','.join(unique_key)}").alias("check_name"),
                F.col("n_violations").cast("long"),
            )
        )
        parts.append(dup)
    for local_col, parent, parent_col in fk:
        orphans = (
            df.filter(F.col(local_col).isNotNull())
            .join(
                parent.select(F.col(parent_col).alias(local_col)).distinct(),
                local_col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(
                F.lit(f"fk:{local_col}").alias("check_name"),
                F.col("n_violations").cast("long"),
            )
        )
        parts.append(orphans)
    if not parts:
        return spark.createDataFrame([], "check_name string, n_violations long")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
