"""Deterministic in-memory fixture for the HPV pipeline (FIXTURES.md §B1).

Three synthetic "files" modeling the reference's Excel sheets
(``/root/reference/README.md:46-57`` contract): wide per-borough rows,
measure columns whose names carry the dimensions, a ``%`` column and a
``2 doses`` column that must be dropped by name, suppression sentinels,
blank cells, one file missing a year group entirely, and one file whose
A1 text does not match the academic-year regex (the SURVEY §1.3 hazard).

Single-sourced: the same literal rows build the Spark DataFrames AND are
rendered into the DuckDB oracle SQL (``render_oracle_sql``), so the
catalog's end-to-end differential check exercises the identical input.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

EXTRACT_DATE = dt.date(2026, 1, 15)

FILE1_COLS = (
    "Local authority",
    "Year 8 females number",
    "Year 8 females number vaccinated",
    "Year 8 males number",
    "Year 8 males number vaccinated",
    "Year 9 females number",
    "Year 9 females number vaccinated",
    "Year 8 females % vaccinated",
    "Year 8 females 2 doses number",
)
FILE1_ROWS = [
    (" camden ", "100", "80", "90", "70", "120", "96", "80%", "60"),
    ("islington", "*", "[E]", "50", "40", "55", "44", "75%", "30"),
    ("HACKNEY", "200", None, "60", None, "70", "56", "70%", "40"),
]
FILE1_A1 = "Child vaccination coverage September 2023 to August 2024"

FILE2_COLS = (
    "Local authority",
    "Year 8 females number",
    "Year 8 females number vaccinated",
    "Year 8 males number",
    "Year 8 males number vaccinated",
)
FILE2_ROWS = [
    ("camden", "110", "88", "95", "76"),
    ("newham", "66", "33", "44", "22"),
]
FILE2_A1 = "Coverage September 2022 to August 2023"

FILE3_COLS = FILE2_COLS
FILE3_ROWS = [("camden", "10", "5", "8", "4")]
FILE3_A1 = "no academic year here"

FILES = [
    (FILE1_COLS, FILE1_ROWS, FILE1_A1),
    (FILE2_COLS, FILE2_ROWS, FILE2_A1),
    (FILE3_COLS, FILE3_ROWS, FILE3_A1),
]


def build_spark_files(spark: SparkSession) -> list[tuple[DataFrame, str]]:
    out = []
    for cols, rows, a1 in FILES:
        schema = StructType([StructField(c, StringType()) for c in cols])
        out.append((spark.createDataFrame(rows, schema), a1))
    return out


def _sql_str(v: str | None) -> str:
    if v is None:
        return "CAST(NULL AS VARCHAR)"
    return "'" + v.replace("'", "''") + "'"


def render_oracle_sql() -> str:
    """DuckDB SQL computing the pipeline's exact expected output from the
    same literal fixture. Mirrors plans/hpv_pipeline.py stage by stage
    (the melt is pre-rendered per cell; the name predicates still apply)."""
    cells = []
    for file_id, (cols, rows, _a1) in enumerate(FILES, start=1):
        for row in rows:
            la = row[0]
            for c, v in zip(cols[1:], row[1:]):
                cells.append(
                    f"({file_id}, {_sql_str(la)}, {_sql_str(c)}, {_sql_str(v)})"
                )
    meta = ",\n    ".join(
        f"({fid}, {_sql_str(a1)})" for fid, (_c, _r, a1) in enumerate(FILES, start=1)
    )
    values = ",\n    ".join(cells)
    return f"""
WITH wide_long(file_id, la, category, value) AS (
  VALUES
    {values}
),
meta(file_id, a1) AS (
  VALUES
    {meta}
),
filtered AS (
  SELECT * FROM wide_long
  WHERE NOT contains(category, '%') AND NOT contains(category, '2 doses')
),
derived AS (
  SELECT file_id,
    array_to_string(
      list_transform(string_split(trim(la), ' '),
                     w -> upper(w[1:1]) || lower(w[2:])), ' ') AS borough_name,
    NULLIF(regexp_extract(category, '(\\d+)', 1), '') AS year_group_number,
    CASE WHEN contains(category, 'females') THEN 'Female' ELSE 'Male' END AS gender_name,
    CASE WHEN contains(lower(category), 'vaccinated')
         THEN 'Number_Vaccinated' ELSE 'Number' END AS metric,
    value
  FROM filtered
),
pivoted AS (
  SELECT file_id, borough_name, year_group_number, gender_name,
    MAX(CASE WHEN metric = 'Number' THEN value END) AS students_total,
    MAX(CASE WHEN metric = 'Number_Vaccinated' THEN value END) AS students_vaccinated
  FROM derived
  GROUP BY file_id, borough_name, year_group_number, gender_name
),
with_meta AS (
  SELECT p.*,
    TRY_CAST(string_split(trim(m.a1), ' ')[-1] AS INT) AS academic_year_end_date,
    NULLIF(regexp_extract(m.a1, '([A-Za-z]+ \\d{{4}} to [A-Za-z]+ \\d{{4}})', 1), '')
      AS academic_year_text,
    DATE '{EXTRACT_DATE.isoformat()}' AS date_extract
  FROM pivoted p JOIN meta m USING (file_id)
),
cleaned AS (
  SELECT borough_name, year_group_number, gender_name,
    TRY_CAST(CASE WHEN students_total IN ('*','[E]','[DS]') THEN NULL
                  ELSE students_total END AS BIGINT) AS students_total,
    TRY_CAST(CASE WHEN students_vaccinated IN ('*','[E]','[DS]') THEN NULL
                  ELSE students_vaccinated END AS BIGINT) AS students_vaccinated,
    academic_year_end_date, academic_year_text, date_extract
  FROM with_meta
  WHERE students_total IS NOT NULL AND students_vaccinated IS NOT NULL
)
SELECT
  borough_name AS "BOROUGH_NAME",
  CASE WHEN GROUPING(year_group_number) = 1 THEN 'All'
       ELSE year_group_number END AS "YEAR_GROUP_NUMBER",
  CASE WHEN GROUPING(gender_name) = 1 THEN 'Both' ELSE gender_name END AS "GENDER_NAME",
  CAST(SUM(students_total) AS BIGINT) AS "STUDENTS_TOTAL",
  CAST(SUM(students_vaccinated) AS BIGINT) AS "STUDENTS_VACCINATED",
  academic_year_end_date AS "ACADEMIC_YEAR_END_DATE",
  academic_year_text AS "ACADEMIC_YEAR_TEXT",
  date_extract AS "DATE_EXTRACT"
FROM cleaned
GROUP BY GROUPING SETS (
  (borough_name, academic_year_end_date, academic_year_text, date_extract,
   gender_name, year_group_number),
  (borough_name, academic_year_end_date, academic_year_text, date_extract,
   gender_name),
  (borough_name, academic_year_end_date, academic_year_text, date_extract,
   year_group_number),
  (borough_name, academic_year_end_date, academic_year_text, date_extract)
)
"""
