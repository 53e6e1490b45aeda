"""The reference-parity HPV coverage pipeline, Spark-first.

End-to-end re-expression of ``/root/reference/src/main.py`` (the whole
205-line pandas ETL) as one lazy DataFrame plan:

  wide sheet(s)                                 (main.py:27, per file)
    → trim/initcap borough                      (main.py:36-37)
    → drop '%' / '2 doses' columns by name      (main.py:40-42)
    → unpivot to (Category, Value)              (main.py:45)
    → derive YearGroup / Gender / Metric        (main.py:48-50)
    → pivot Metric → measure columns            (main.py:53)
    → attach A1-derived academic year + date    (main.py:60-70)
    → union files by name                       (main.py:77)
    → drop null-measure rows, sentinels → NULL  (main.py:80-83)
    → CUBE(Gender='Both', YearGroup='All') base ∪ rollups
                                                (main.py:87-119, one pass
                                                 here — see operators/rollup.py)
    → UPPERCASE columns, fixed 8-col schema     (main.py:120,
                                                 docs/Create HPV Table.sql:1-10)

Scale story: every stage before the rollup is narrow (no shuffle); the
rollup is the single exchange; file parallelism comes from the scan, so
10 files or 10 million behave identically. No collect() anywhere — the
A1 metadata enters as a literal per source (the reference's header-cell
read is driver-side there too, main.py:30,60).

Documented divergences from the reference (all strictly more defined):
- ``initcap`` vs pandas ``str.title()`` on non-letter boundaries (F2).
- ``Academic_Year_Text`` always exists; no-match A1 → NULL (the §1.3
  conditional-column hazard becomes total semantics).
- Null grouping keys form groups (pandas groupby drops them).
- Sum of an all-NULL group is NULL, not 0 (A3).
- Sentinel replace is scoped to the measure columns, not every column (P6).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import initcap_trim, regexp_extract_null, sentinels_to_null
from ..operators.reshape import unpivot
from ..operators.rollup import cube_rollup_labeled

ID_COL = "Local authority"
ACADEMIC_YEAR_RE = r"([A-Za-z]+ \d{4} to [A-Za-z]+ \d{4})"

FINAL_COLUMNS = (
    "BOROUGH_NAME",
    "YEAR_GROUP_NUMBER",
    "GENDER_NAME",
    "STUDENTS_TOTAL",
    "STUDENTS_VACCINATED",
    "ACADEMIC_YEAR_END_DATE",
    "ACADEMIC_YEAR_TEXT",
    "DATE_EXTRACT",
)


def drop_columns_by_name(df: DataFrame, *needles: str) -> DataFrame:
    """Schema-level projection: drop columns whose NAME contains a needle
    (reference main.py:40-42). Lazy schemas make the same trick free."""
    doomed = [c for c in df.columns if any(n in c for n in needles)]
    return df.drop(*doomed)


def derive_dimensions(
    long_df: DataFrame,
    borough_col: str = ID_COL,
    category_col: str = "Category",
    value_col: str = "Value",
) -> DataFrame:
    """Melted rows → dimension columns (reference main.py:36-50): borough
    trim/initcap, year-group digits, gender/metric containment mapping.
    Category-name predicates (% / 2 doses) are applied here as row
    filters so melted sources (e.g. the CSV sheet reader, which emits
    long form directly) share the exact same semantics as the wide path."""
    cat = F.col(category_col)
    return (
        long_df.filter(~cat.contains("%") & ~cat.contains("2 doses"))
        .select(
            initcap_trim(borough_col).alias("Borough_Name"),
            regexp_extract_null(cat, r"(\d+)").alias("Year_Group_Number"),
            F.when(cat.contains("females"), F.lit("Female"))
            .otherwise(F.lit("Male"))
            .alias("Gender_Name"),
            F.when(F.lower(cat).contains("vaccinated"), F.lit("Number_Vaccinated"))
            .otherwise(F.lit("Number"))
            .alias("Metric"),
            F.col(value_col).alias("Value"),
            *[c for c in long_df.columns if c in ("Academic_Year_End_Date",
                                                   "Academic_Year_Text",
                                                   "Date_Extract", "__a1_text")],
        )
    )


def normalize_wide_sheet(df: DataFrame, id_col: str = ID_COL) -> DataFrame:
    """One wide sheet → long (Borough, Year_Group, Gender, Metric, Value).

    Column drops by NAME (main.py:40-42) happen schema-side here; the
    equivalent category-name filter in derive_dimensions is a no-op on
    what remains (same predicate, same result)."""
    df = drop_columns_by_name(df, "%", "2 doses")
    long_df = unpivot(df, [id_col], None, "Category", "Value")
    return derive_dimensions(long_df, borough_col=id_col)


PIVOT_KEYS = (
    "Borough_Name",
    "Year_Group_Number",
    "Gender_Name",
    "Academic_Year_End_Date",
    "Academic_Year_Text",
    "Date_Extract",
)


def pivot_measures(long_df: DataFrame) -> DataFrame:
    """Metric → two measure columns (reference main.py:53), ONE pivot over
    the union of all files (the per-file metadata columns are in the key,
    so files never collide unless they share identical metadata — in
    which case their cells merge; the reference would instead keep
    duplicate output rows, a latent bug we do not reproduce).

    Keys are unique per wide cell by construction; ``first`` is exact."""
    return (
        long_df.groupBy(*PIVOT_KEYS)
        .pivot("Metric", ["Number", "Number_Vaccinated"])
        .agg(F.first("Value"))
        .withColumnsRenamed(
            {"Number": "Students_Total", "Number_Vaccinated": "Students_Vaccinated"}
        )
    )


def academic_year_meta(a1_text: str | None | Column) -> tuple[Column, Column]:
    """A1 header text → (end-year int, academic-year text) as Columns.

    The reference does this driver-side on the collected cell value
    (main.py:60-67); the same expressions work on a literal — or on a
    per-row Column when the source carries the A1 text as a column (the
    distributed CSV sheet reader). No-match → NULLs (total semantics vs
    the reference's missing column).
    """
    lit = a1_text if isinstance(a1_text, Column) else F.lit(a1_text)
    year_end = F.try_element_at(F.split(F.trim(lit), " "), F.lit(-1)).try_cast("int")
    year_text = regexp_extract_null(lit, ACADEMIC_YEAR_RE)
    return year_end, year_text


def process_wide_file(
    df: DataFrame,
    a1_text: str | None,
    extract_date: dt.date,
    id_col: str = ID_COL,
) -> DataFrame:
    """Normalize one wide sheet to LONG form with its per-file metadata
    attached — entirely narrow (no shuffle); the single shared pivot
    happens after the union."""
    year_end, year_text = academic_year_meta(a1_text)
    return (
        normalize_wide_sheet(df, id_col)
        .withColumn("Academic_Year_End_Date", year_end)
        .withColumn("Academic_Year_Text", year_text)
        .withColumn("Date_Extract", F.lit(extract_date).cast("date"))
    )


def combine_files(dfs: Sequence[DataFrame]) -> DataFrame:
    """UNION ALL by column name with null-fill (pandas concat parity,
    reference main.py:77)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def clean_measures(df: DataFrame) -> DataFrame:
    """Reference main.py:80-83, order preserved: drop rows whose RAW
    measure is null (blank cells), then sentinel→NULL, then explicit
    try_cast to long (the dirty→typed boundary the reference left to
    Snowflake)."""
    df = df.na.drop(subset=["Students_Total", "Students_Vaccinated"])
    for c in ("Students_Total", "Students_Vaccinated"):
        df = df.withColumn(c, sentinels_to_null(c).try_cast("long"))
    return df


def rollup_cube(df: DataFrame) -> DataFrame:
    """Base ∪ 'Both'-gender ∪ 'All'-years ∪ both — one grouping-sets pass
    (reference main.py:87-119; see operators/rollup.py)."""
    return cube_rollup_labeled(
        df,
        fixed_dims=[
            "Borough_Name",
            "Academic_Year_End_Date",
            "Academic_Year_Text",
            "Date_Extract",
        ],
        labeled_dims={"Gender_Name": "Both", "Year_Group_Number": "All"},
        aggs=[
            F.sum("Students_Total").alias("Students_Total"),
            F.sum("Students_Vaccinated").alias("Students_Vaccinated"),
        ],
    )


def finalize(df: DataFrame) -> DataFrame:
    """UPPERCASE names + fixed column order (reference main.py:120 +
    docs/Create HPV Table.sql)."""
    return df.toDF(*[c.upper() for c in df.columns]).select(*FINAL_COLUMNS)


def run_pipeline(
    files: Sequence[tuple[DataFrame, str | None]],
    extract_date: dt.date,
) -> DataFrame:
    """The whole reference ETL as one lazy plan over N wide sheets.

    Shuffle topology is file-count independent: N × (narrow melt) →
    union → ONE pivot exchange → ONE grouping-sets exchange. The
    reference executes 2 + 3N pandas materializations for the same
    result."""
    per_file = [process_wide_file(df, a1, extract_date) for df, a1 in files]
    return finalize(
        rollup_cube(clean_measures(pivot_measures(combine_files(per_file))))
    )
