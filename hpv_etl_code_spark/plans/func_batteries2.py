"""Math + regex function batteries (remaining §2.4 'not present' surface).

Math determinism: abs/ceil/floor/sign/pmod/sqrt are IEEE-exact; ln/exp
agree to < 1 ulp across libm implementations, far inside the round(…, 6)
comparison margin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table


def math_cols() -> list:
    """Math battery projection over ``part`` (reused by the merged
    part_funcs_battery entry)."""
    x = F.col("p_retailprice")
    return [
        F.abs(x - 1000).alias("abs_delta"),
        F.ceil(x).alias("ceil_p"),
        F.floor(x).alias("floor_p"),
        F.round(x, 1).alias("round1_p"),
        F.signum(x - 1000).alias("sign_delta"),
        F.pmod(F.col("p_size"), F.lit(7)).alias("size_mod7"),
        F.round(F.sqrt(x), 6).alias("sqrt_p"),
        F.round(F.log(x), 6).alias("ln_p"),
        F.pow(F.col("p_size").cast("double"), 2).alias("size_sq"),
    ]


def math_funcs_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", *math_cols())


MATH_FUNCS_SQL = """
SELECT p_partkey,
  abs(p_retailprice - 1000) AS abs_delta,
  ceil(p_retailprice)::BIGINT AS ceil_p,
  floor(p_retailprice)::BIGINT AS floor_p,
  round(p_retailprice, 1) AS round1_p,
  sign(p_retailprice - 1000)::DOUBLE AS sign_delta,
  p_size % 7 AS size_mod7,
  round(sqrt(p_retailprice), 6) AS sqrt_p,
  round(ln(p_retailprice), 6) AS ln_p,
  pow(p_size, 2) AS size_sq
FROM part
"""


def regex_cols() -> list:
    """Regex battery projection over ``documents`` (reused by the merged
    doc_funcs_battery entry)."""
    return [
        F.regexp_replace("text", r"\bdata\b", "DATA").alias("replaced"),
        F.regexp_count("text", F.lit(r"[aeiou]")).alias("n_vowels"),
        F.col("text").rlike(r"join.*filter").alias("has_join_then_filter"),
        F.col("lang").like("e%").alias("lang_starts_e"),
        # joined string, not a raw array (gate canonicalizer can't sort lists)
        F.array_join(
            F.regexp_extract_all("text", F.lit(r"\b(s\w+)\b"), 1), ","
        ).alias("s_words"),
    ]


def regex_funcs_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", *regex_cols())


REGEX_FUNCS_SQL = """
SELECT doc_id,
  regexp_replace(text, '\\bdata\\b', 'DATA', 'g') AS replaced,
  len(regexp_extract_all(text, '[aeiou]'))::INT AS n_vowels,
  regexp_matches(text, 'join.*filter') AS has_join_then_filter,
  lang LIKE 'e%' AS lang_starts_e,
  COALESCE(array_to_string(regexp_extract_all(text, '\\b(s\\w+)\\b', 1), ','), '')
    AS s_words
FROM documents
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("math_funcs_battery", math_funcs_battery, MATH_FUNCS_SQL)
    register("regex_funcs_battery", regex_funcs_battery, REGEX_FUNCS_SQL)
