"""Data-layout operators: scalable global row numbering and Z-order
(Morton) clustering keys.

Both address the same 100 TB problem — imposing a GLOBAL order on data
without funneling it through one task:

- ``global_row_index`` is the declarative two-phase zipWithIndex: a
  naive ``row_number() OVER (ORDER BY key)`` collapses the whole table
  into ONE window partition (single-task sort — the classic scale
  killer). Here rows are bucketed by key range, numbered inside each
  bucket in parallel, and shifted by per-bucket offsets computed from a
  bucket-level count table (a few hundred rows of metadata). No
  ``collect``; the only single-partition step is the window over the
  64-row bucket-count table.
- ``morton_z16`` interleaves the low 16 bits of two dimensions into one
  32-bit Z-value. Range-partitioning + sorting by the Z-value co-locates
  rows that are close in BOTH dimensions, so min/max column statistics
  (parquet row-group pruning, Delta/Iceberg file skipping) prune
  two-dimensional predicates — the standard multi-dimensional clustering
  trick behind OPTIMIZE ZORDER BY.

The reference engine has no layout operators (its corpus is ~10³ rows of
Excel, `/root/reference/src/main.py`); this is north-star extension
surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _nan_key_and_finite(df: DataFrame, key: str) -> tuple[Column, Column]:
    """(is-NaN predicate, finite-or-NULL key) for the two-phase
    operators' bounds: float/double keys can hold NaN, which Spark
    sorts ABOVE every value — so it would poison ``max(key)`` and turn
    every ``width_bucket`` NULL (silent row loss through the inner
    ``__bucket`` join). Non-float keys get a constant-false predicate
    that codegen folds away."""
    from pyspark.sql.types import DoubleType, FloatType

    if isinstance(df.schema[key].dataType, (DoubleType, FloatType)):
        nan_key = F.isnan(F.col(key))
        return nan_key, F.when(~nan_key, F.col(key))
    return F.lit(False), F.col(key)


def global_row_index(
    df: DataFrame,
    key: str,
    n_buckets: int = 64,
    index_col: str = "global_idx",
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """Dense 1-based global index ordered by ``(key, *tiebreak)`` —
    the combination must be unique for a deterministic result — without
    a global single-partition sort. Range bucketing uses ``key`` alone
    (order-preserving is all that's needed: equal keys land in one
    bucket, where the window's tiebreak ordering applies).

    Three declarative stages, all planned by Catalyst:

    1. key bounds (min/max — one partial-agg pass) broadcast-joined on;
       ``width_bucket`` assigns an ORDER-PRESERVING bucket id, so bucket
       boundaries respect the key order by construction.
    2. per-bucket counts (n_buckets rows) → running-sum window over the
       bucket id gives each bucket its global offset. The window is
       single-partition but over metadata-sized input.
    3. ``row_number`` inside each bucket (parallel across buckets — the
       per-task sort is |rows|/n_buckets) plus the broadcast offset.

    At 100 TB: raise ``n_buckets`` so each bucket fits an executor's
    sort budget; stage 2 stays metadata-sized.

    ``key`` must be numeric (``width_bucket`` needs arithmetic bounds) —
    enforced up front. NULL keys are kept and numbered FIRST (their own
    bucket 0 before all value buckets), matching the ``NULLS FIRST``
    default of ``row_number() OVER (ORDER BY key)`` that this operator
    replaces; min/max ignore NULLs, so value-bucket boundaries are
    unaffected. Float NaN keys are likewise kept and numbered LAST
    (Spark sorts NaN above every value), with the bounds computed over
    finite values only (:func:`_nan_key_and_finite`) — no key value
    silently drops rows.
    """
    from pyspark.sql.types import NumericType

    if not isinstance(df.schema[key].dataType, NumericType):
        raise TypeError(
            f"global_row_index key {key!r} must be numeric, got "
            f"{df.schema[key].dataType.simpleString()}; bucketize or cast first"
        )
    nan_key, finite = _nan_key_and_finite(df, key)
    bounds = df.agg(
        F.min(finite).alias("__lo"), F.max(finite).alias("__hi")
    )
    # NULL keys → bucket 0 (before width_bucket's 1..n_buckets), so they
    # are numbered first instead of being silently dropped by the inner
    # offsets join while still inflating the cumulative counts; NaN keys
    # → bucket n_buckets+1 (numbered last), for the same reason
    bucketed = df.join(F.broadcast(bounds)).withColumn(
        "__bucket",
        F.when(F.col(key).isNull(), F.lit(0))
        .when(nan_key, F.lit(n_buckets + 1))
        .otherwise(
            F.width_bucket(
                F.col(key), F.col("__lo"), F.col("__hi") + 1, F.lit(n_buckets)
            )
        ),
    ).drop("__lo", "__hi")

    offsets = (
        bucketed.groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .withColumn(
            "__offset",
            F.sum("__bn").over(
                Window.orderBy("__bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("__bucket", F.coalesce("__offset", F.lit(0)).alias("__offset"))
    )

    local = F.row_number().over(
        Window.partitionBy("__bucket").orderBy(key, *tiebreak)
    )
    return (
        bucketed.join(F.broadcast(offsets), "__bucket")
        .withColumn(index_col, (F.col("__offset") + local).cast("long"))
        .drop("__bucket", "__offset")
    )


def grouped_row_index(
    df: DataFrame,
    group: str,
    key: str,
    n_buckets: int = 64,
    index_col: str = "group_idx",
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """Dense 1-based rank of ``key`` WITHIN each ``group`` — the grouped
    generalization of :func:`global_row_index`, for when a plain
    ``row_number() OVER (PARTITION BY group ORDER BY key)`` would sort
    each entire group in ONE task (the scale killer whenever groups are
    few and large — e.g. ranking three metrics of a billion customers
    with ``group = metric``).

    Same three declarative stages, group-qualified:

    1. per-group key bounds (one grouped partial-agg pass) broadcast
       back; ``width_bucket`` gives an order-preserving bucket id
       within the group.
    2. per-(group, bucket) counts → running-sum window PARTITIONED BY
       group over the bucket id: per-bucket offsets. The window input
       is |groups|·n_buckets metadata rows.
    3. ``row_number`` inside each (group, bucket) — parallel across
       group×bucket cells — plus the broadcast offset.

    NULL keys rank FIRST within their group, NaN keys LAST (matching
    ``row_number() OVER (... ORDER BY key)``), exactly as in
    :func:`global_row_index`. ``(key, *tiebreak)`` must be unique
    within a group for a deterministic result.
    """
    from pyspark.sql.types import NumericType

    if not isinstance(df.schema[key].dataType, NumericType):
        raise TypeError(
            f"grouped_row_index key {key!r} must be numeric, got "
            f"{df.schema[key].dataType.simpleString()}; bucketize or cast first"
        )
    nan_key, finite = _nan_key_and_finite(df, key)
    bounds = df.groupBy(group).agg(
        F.min(finite).alias("__lo"), F.max(finite).alias("__hi")
    )
    bucketed = df.join(F.broadcast(bounds), group).withColumn(
        "__bucket",
        F.when(F.col(key).isNull(), F.lit(0))
        .when(nan_key, F.lit(n_buckets + 1))
        .otherwise(
            F.width_bucket(
                F.col(key), F.col("__lo"), F.col("__hi") + 1, F.lit(n_buckets)
            )
        ),
    ).drop("__lo", "__hi")

    offsets = (
        bucketed.groupBy(group, "__bucket")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .withColumn(
            "__offset",
            F.sum("__bn").over(
                Window.partitionBy(group)
                .orderBy("__bucket")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .select(
            group,
            "__bucket",
            F.coalesce("__offset", F.lit(0)).alias("__offset"),
        )
    )

    local = F.row_number().over(
        Window.partitionBy(group, "__bucket").orderBy(key, *tiebreak)
    )
    return (
        bucketed.join(F.broadcast(offsets), [group, "__bucket"])
        .withColumn(index_col, (F.col("__offset") + local).cast("long"))
        .drop("__bucket", "__offset")
    )


def global_prefix_sum(
    df: DataFrame,
    key: str,
    weight: str,
    cum_col: str = "cum_weight",
    n_buckets: int = 64,
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """INCLUSIVE running sum of ``weight`` in global ``(key, *tiebreak)``
    order — ``SUM(weight) OVER (ORDER BY key ...)`` without its
    single-partition sort, the third member of the two-phase family
    (:func:`global_row_index` is the ``weight = 1`` special case kept
    separate for its NULL/NaN rank contract). This is the primitive
    behind exact weighted quantiles/medians and Lorenz-style cumulative
    shares at scale.

    Stages: per-bucket WEIGHT sums → running-sum window over the
    n_buckets metadata rows gives bucket offsets; inside each bucket a
    parallel cumulative window ordered by ``(key, *tiebreak)``; result
    = offset + local running sum. NULL keys accumulate FIRST, NaN keys
    LAST (same finite-bounds + dedicated-bucket routing as
    :func:`global_row_index` — ADVICE r5: without it one NaN key
    poisons ``max(key)``, ``width_bucket`` returns NULL everywhere and
    the inner ``__bucket`` join silently drops EVERY row). ``weight``
    must be an INTEGRAL type (LongType result keeps the sum exact) —
    enforced with a TypeError rather than a silent ``cast('long')``
    truncation of doubles; NULL weights count as 0.
    """
    from pyspark.sql.types import IntegralType, NumericType

    if not isinstance(df.schema[key].dataType, NumericType):
        raise TypeError(
            f"global_prefix_sum key {key!r} must be numeric, got "
            f"{df.schema[key].dataType.simpleString()}"
        )
    if not isinstance(df.schema[weight].dataType, IntegralType):
        raise TypeError(
            f"global_prefix_sum weight {weight!r} must be integral "
            f"(got {df.schema[weight].dataType.simpleString()}); scale "
            "to integer units (e.g. cents) and cast first — a silent "
            "cast('long') would truncate fractional weights"
        )
    nan_key, finite = _nan_key_and_finite(df, key)
    bounds = df.agg(F.min(finite).alias("__lo"), F.max(finite).alias("__hi"))
    bucketed = df.join(F.broadcast(bounds)).withColumn(
        "__bucket",
        F.when(F.col(key).isNull(), F.lit(0))
        .when(nan_key, F.lit(n_buckets + 1))
        .otherwise(
            F.width_bucket(
                F.col(key), F.col("__lo"), F.col("__hi") + 1, F.lit(n_buckets)
            )
        ),
    ).drop("__lo", "__hi")
    w0 = F.coalesce(F.col(weight).cast("long"), F.lit(0))
    offsets = (
        bucketed.groupBy("__bucket")
        .agg(F.sum(w0).alias("__bw"))
        .withColumn(
            "__offset",
            F.sum("__bw").over(
                Window.orderBy("__bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("__bucket", F.coalesce("__offset", F.lit(0)).alias("__offset"))
    )
    local = F.sum(w0).over(
        Window.partitionBy("__bucket")
        .orderBy(key, *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.join(F.broadcast(offsets), "__bucket")
        .withColumn(cum_col, (F.col("__offset") + local).cast("long"))
        .drop("__bucket", "__offset")
    )


def grouped_prefix_sum(
    df: DataFrame,
    group: str,
    key: str,
    weight: str,
    cum_col: str = "cum_weight",
    n_buckets: int = 64,
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """INCLUSIVE running sum of ``weight`` in ``(key, *tiebreak)`` order
    WITHIN each ``group`` — completes the two-phase family
    (:func:`global_row_index` / :func:`grouped_row_index` /
    :func:`global_prefix_sum`): per-group cumulative shares, weighted
    quantiles and Pareto cuts without
    ``SUM() OVER (PARTITION BY group ORDER BY key)``'s one-task-per-
    group sort. Same stages as :func:`global_prefix_sum`, group-
    qualified: per-group bounds → order-preserving buckets → per-
    (group, bucket) weight offsets (a metadata window PARTITIONED BY
    group) → parallel within-bucket cumulative windows. NULL keys
    accumulate FIRST within their group, NaN keys LAST (finite-bounds
    + NaN-bucket routing as :func:`global_prefix_sum`, ADVICE r5);
    NULL weights count as 0; ``weight`` must be an INTEGRAL type
    (exact LongType running sums) — TypeError otherwise.
    """
    from pyspark.sql.types import IntegralType, NumericType

    if not isinstance(df.schema[key].dataType, NumericType):
        raise TypeError(
            f"grouped_prefix_sum key {key!r} must be numeric, got "
            f"{df.schema[key].dataType.simpleString()}"
        )
    if not isinstance(df.schema[weight].dataType, IntegralType):
        raise TypeError(
            f"grouped_prefix_sum weight {weight!r} must be integral "
            f"(got {df.schema[weight].dataType.simpleString()}); scale "
            "to integer units (e.g. cents) and cast first — a silent "
            "cast('long') would truncate fractional weights"
        )
    nan_key, finite = _nan_key_and_finite(df, key)
    bounds = df.groupBy(group).agg(
        F.min(finite).alias("__lo"), F.max(finite).alias("__hi")
    )
    bucketed = df.join(F.broadcast(bounds), group).withColumn(
        "__bucket",
        F.when(F.col(key).isNull(), F.lit(0))
        .when(nan_key, F.lit(n_buckets + 1))
        .otherwise(
            F.width_bucket(
                F.col(key), F.col("__lo"), F.col("__hi") + 1, F.lit(n_buckets)
            )
        ),
    ).drop("__lo", "__hi")
    w0 = F.coalesce(F.col(weight).cast("long"), F.lit(0))
    offsets = (
        bucketed.groupBy(group, "__bucket")
        .agg(F.sum(w0).alias("__bw"))
        .withColumn(
            "__offset",
            F.sum("__bw").over(
                Window.partitionBy(group)
                .orderBy("__bucket")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .select(
            group,
            "__bucket",
            F.coalesce("__offset", F.lit(0)).alias("__offset"),
        )
    )
    local = F.sum(w0).over(
        Window.partitionBy(group, "__bucket")
        .orderBy(key, *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.join(F.broadcast(offsets), [group, "__bucket"])
        .withColumn(cum_col, (F.col("__offset") + local).cast("long"))
        .drop("__bucket", "__offset")
    )


def morton_z16(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a Z-order (Morton) value: x occupies even bit
    positions, y odd. Pure integer arithmetic — runs in whole-stage
    codegen and is reproducible by any engine (the oracle twin unrolls
    the same expression in SQL).

    Dimensions wider than ``bits`` bits must be pre-quantized (mask or
    bucketize) by the caller — the mask here makes that explicit rather
    than silently overflowing.
    """
    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("long")
    for j in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xm, j).bitwiseAND(F.lit(1)), 2 * j)
            + F.shiftleft(F.shiftright(ym, j).bitwiseAND(F.lit(1)), 2 * j + 1)
        )
    return z


def morton_z16_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The ANSI-SQL twin of :func:`morton_z16` (same unrolled
    arithmetic), for differential-testing oracles."""
    mask = (1 << bits) - 1
    terms = []
    for j in range(bits):
        terms.append(f"((({x_expr}) & {mask}) >> {j} & 1) * {1 << (2 * j)}")
        terms.append(f"((({y_expr}) & {mask}) >> {j} & 1) * {1 << (2 * j + 1)}")
    return " + ".join(terms)


def zorder_layout(
    df: DataFrame, x: str, y: str, n_partitions: int = 32
) -> DataFrame:
    """Cluster ``df`` for two-dimensional pruning: range-partition and
    sort by the Morton value of (x, y). Written files then carry tight
    min/max stats on BOTH columns, so scans filtering either dimension
    (or a rectangle) skip most files. The Z-column is dropped — layout
    is a side effect of order, not a schema change."""
    with_z = df.withColumn("__z", morton_z16(F.col(x), F.col(y)))
    return (
        with_z.repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def hilbert_xy2d(df: DataFrame, x: str, y: str, out: str, order: int = 8) -> DataFrame:
    """Hilbert-curve index of two pre-quantized dimensions in
    [0, 2^order): the locality-preserving successor to Morton Z-order.
    Consecutive Hilbert positions are always GRID NEIGHBORS (unit
    steps, no Z-shape jumps), so range-partitioning by the Hilbert key
    gives files whose (x, y) bounding boxes are tighter than Z-order's
    — measurably fewer files read per rectangle predicate (see
    ``plans/ops_queries.hilbert_prune_stats``).

    The classic per-level rotate/reflect recurrence (Hamilton 2006 /
    the public-domain xy2d form, per-level reflection width s) is
    sequential in s, so it unrolls into ``order`` chained projections —
    all inside one whole-stage-codegen span, zero shuffles, pure
    64-bit integer ops reproducible by any engine
    (:func:`hilbert_xy2d_sql` is the oracle twin; bijectivity and the
    unit-step property are pytest-locked on a full grid).
    """
    cur = df.withColumn("__hx", F.col(x).cast("long")).withColumn(
        "__hy", F.col(y).cast("long")
    ).withColumn(out, F.lit(0).cast("long"))
    s = 1 << (order - 1)
    while s > 0:
        rx = F.when(F.col("__hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("__hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        # s*s as a LONG literal: at order 16 the level weight is 2^30
        # and ×3 overflows INT under ANSI once the top bit is set
        new_d = F.col(out) + F.lit(s * s).cast("long") * (
            F.lit(3) * rx
        ).bitwiseXOR(ry)
        new_x = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - F.col("__hy")).otherwise(
                F.col("__hy")
            ),
        ).otherwise(F.col("__hx"))
        new_y = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - F.col("__hx")).otherwise(
                F.col("__hx")
            ),
        ).otherwise(F.col("__hy"))
        cur = cur.withColumns(
            {"__hx": new_x, "__hy": new_y, out: new_d}
        )
        s >>= 1
    return cur.drop("__hx", "__hy")


def hilbert_xy2d_sql(
    carry_cols: str,
    x_expr: str,
    y_expr: str,
    source_sql: str,
    order: int = 8,
    out: str = "hval",
) -> str:
    """ANSI-SQL twin of :func:`hilbert_xy2d`: the same per-level
    recurrence as a stack of ``order`` CTE layers (linear text size —
    inlining would double the expression per level). Returns a complete
    ``WITH … SELECT`` statement over ``source_sql``, carrying
    ``carry_cols`` through and emitting the Hilbert index as ``out``."""
    lines = [
        f"WITH __h0 AS (SELECT {carry_cols}, ({x_expr})::BIGINT AS __hx,"
        f" ({y_expr})::BIGINT AS __hy, 0::BIGINT AS __hd FROM {source_sql})"
    ]
    s = 1 << (order - 1)
    i = 0
    while s > 0:
        rx = f"(CASE WHEN (__hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (__hy & {s}) > 0 THEN 1 ELSE 0 END)"
        lines.append(
            f", __h{i + 1} AS (SELECT {carry_cols},"
            f" __hd + {s * s} * xor(3 * {rx}, {ry}) AS __hd,"
            f" CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {s - 1} - __hy ELSE __hy END) ELSE __hx END AS __hx,"
            f" CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {s - 1} - __hx ELSE __hx END) ELSE __hy END AS __hy"
            f" FROM __h{i})"
        )
        s >>= 1
        i += 1
    lines.append(f"SELECT {carry_cols}, __hd AS {out} FROM __h{i}")
    return "\n".join(lines)
