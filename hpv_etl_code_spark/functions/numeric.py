"""Deterministic numeric aggregation helpers.

Floating-point ``sum``/``avg`` are order-dependent, and a distributed
engine sums in nondeterministic order — so any query whose results feed
the differential-test gate (driver oracle hash, SURVEY §5.2) aggregates
through exact decimals instead:

- :func:`dsum`: cast each value to ``DECIMAL(20,8)``, sum exactly
  (order-independent), then present as DOUBLE — the exact decimal value
  converts to its nearest IEEE double deterministically, and DOUBLE is
  how DuckDB materializes decimal aggregates through pandas (round-1
  lesson: presenting DECIMAL(38,8) made values arrive as ``Decimal``
  objects on the Spark side vs ``float64`` on the oracle side — string
  mismatch at the gate despite identical values). Scale 8 is chosen so
  that products of the corpus's 2-decimal monetary inputs (≤6 true
  decimals) can never land on a rounding tie when converted from IEEE
  double — both engines then agree on the nearest decimal bit-for-bit.
- :func:`avg6`: exact decimal sum divided by count in IEEE double
  (deterministic given identical operands), rounded to 6 places.

At 100 TB this costs nothing extra: decimal sums use Spark's built-in
partial/final hash aggregation identically to double sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(20,8)")


def dsum(col: Column | str) -> Column:
    """Exact, order-independent sum presented as DOUBLE."""
    return F.sum(_dec(col)).cast("double")


def avg6(col: Column | str) -> Column:
    """Deterministic average: exact decimal sum / count, rounded to 6dp."""
    return F.round(
        F.sum(_dec(col)).cast("double") / F.count(col), 6
    )
