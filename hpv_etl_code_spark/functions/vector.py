"""Vector math over ``array<float>`` embedding columns — native array
expressions (``zip_with`` + ``aggregate``), evaluated inside codegen.

Determinism note (differential-gate critical): the fold in
:func:`dot` runs strictly left-to-right over the array, which makes the
double-precision result bit-exact and engine-portable (verified equal to
DuckDB's ``list_dot_product`` on DOUBLE[]). Always cast float32 inputs
to double *before* multiplying — float accumulation order would
otherwise leak engine-specific rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic, portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot/(|a|·|b|); 0-vector guard yields NULL rather than ±inf."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


# ------------------------------------------------- int8 quantization

def quantize_scale(vec: Column | str) -> Column:
    """Per-vector symmetric int8 scale: max|v|/127 (1.0 for the zero
    vector so quantization is total)."""
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    return F.when(amax != 0.0, amax / 127.0).otherwise(F.lit(1.0))


def quantize_int8(vec: Column | str, scale: Column) -> Column:
    """v → round-half-up(v/scale) as int (range [-127, 127]).

    ``floor(x/s + 0.5)`` instead of ``round``: round() ties-away/half-even
    semantics differ across engines, floor is universal — keeps the
    differential gate bit-exact.
    """
    return F.transform(vec, lambda x: F.floor(x.cast("double") / scale + 0.5).cast("int"))


def dequantize(qvec: Column | str, scale: Column) -> Column:
    return F.transform(qvec, lambda q: q.cast("double") * scale)
