"""Scalar cleaning/derivation expressions — all native Columns, no UDFs.

Reference analogs (``/root/reference/src/main.py``):
- ``:36-37``  ``str.strip()`` + ``str.title()``      → :func:`initcap_trim`
- ``:48``     ``Series.str.extract(r"(\\d+)")``      → :func:`regexp_extract_null`
- ``:81-83``  sentinel replace ``*``/``[E]``/``[DS]`` → :func:`sentinels_to_null`
  (the reference applies the replace to *every* column; the engine scopes
  it to the columns the caller names — documented divergence, SURVEY §2.2 P6)

The reference implements gender/metric mapping as row-wise Python lambdas
(``src/main.py:49-50``); here they are ``when``/``contains`` expressions so
the whole normalize stage stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Suppression markers used by UKHSA coverage spreadsheets
#: (reference ``src/main.py:81-83``).
SENTINELS = ("*", "[E]", "[DS]")


def initcap_trim(col: Column | str) -> Column:
    """Trim + title-case a label column.

    Divergence note (SURVEY §2.4 F2): pandas ``str.title()`` capitalizes
    after any non-letter (``"king's cross" → "King'S Cross"``); Spark
    ``initcap`` splits on whitespace only. The engine standardizes on
    ``initcap`` semantics.
    """
    return F.initcap(F.trim(col))


def nullif_empty(col: Column) -> Column:
    """'' → NULL (regexp_extract parity shim; pandas extract yields NaN)."""
    return F.nullif(col, F.lit(""))


def regexp_extract_null(col: Column | str, pattern: str, group: int = 1) -> Column:
    """``regexp_extract`` with pandas parity: no match → NULL, not ''."""
    return nullif_empty(F.regexp_extract(col, pattern, group))


def sentinels_to_null(col: Column | str, sentinels: tuple[str, ...] = SENTINELS) -> Column:
    """Replace suppression sentinels with NULL (reference ``src/main.py:81-83``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(*sentinels), F.lit(None)).otherwise(c)


def clean_measure(col: Column | str, dtype: str = "long") -> Column:
    """Sentinel-scrub then cast a dirty string measure to a numeric type.

    Makes the reference's implicit dirty→typed boundary (Excel inference +
    Snowflake coercion, SURVEY §1.2) explicit in one place.
    """
    return sentinels_to_null(col).cast(dtype)
