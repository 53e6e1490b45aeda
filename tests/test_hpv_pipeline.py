"""Golden + invariant tests for the reference-parity HPV pipeline
(fixture: hpv_etl_code_spark/plans/hpv_fixture.py, FIXTURES.md §B1)."""

from __future__ import annotations

import pytest

from hpv_etl_code_spark.plans import hpv_fixture
from hpv_etl_code_spark.plans.hpv_pipeline import run_pipeline


@pytest.fixture(scope="module")
def result(spark):
    files = hpv_fixture.build_spark_files(spark)
    rows = run_pipeline(files, hpv_fixture.EXTRACT_DATE).collect()
    key = lambda r: (
        r.BOROUGH_NAME,
        r.ACADEMIC_YEAR_END_DATE,
        r.YEAR_GROUP_NUMBER,
        r.GENDER_NAME,
    )
    return {key(r): r for r in rows}


def test_base_rows_golden(result):
    r = result[("Camden", 2024, "8", "Female")]
    assert (r.STUDENTS_TOTAL, r.STUDENTS_VACCINATED) == (100, 80)
    assert r.ACADEMIC_YEAR_TEXT == "September 2023 to August 2024"
    assert str(r.DATE_EXTRACT) == "2026-01-15"


def test_initcap_trim_applied(result):
    # ' camden ' and 'HACKNEY' normalized; raw forms absent
    assert any(k[0] == "Camden" for k in result)
    assert any(k[0] == "Hackney" for k in result)
    assert not any(k[0] in (" camden ", "HACKNEY", "camden") for k in result)


def test_sentinel_rows_survive_with_null_measures(result):
    # islington Y8 female: '*'/'[E]' → row kept (dropna precedes the
    # sentinel replace, reference main.py:80-83), measures NULL
    r = result[("Islington", 2024, "8", "Female")]
    assert r.STUDENTS_TOTAL is None and r.STUDENTS_VACCINATED is None


def test_blank_measure_rows_dropped(result):
    # hackney Y8 rows had blank (None) vaccinated cells → dropped pre-rollup
    assert ("Hackney", 2024, "8", "Female") not in result
    assert ("Hackney", 2024, "8", "Male") not in result
    assert result[("Hackney", 2024, "9", "Female")].STUDENTS_TOTAL == 70


def test_both_gender_rollup(result):
    # camden 2024 Y8: Female 100/80 + Male 90/70
    r = result[("Camden", 2024, "8", "Both")]
    assert (r.STUDENTS_TOTAL, r.STUDENTS_VACCINATED) == (190, 150)
    # islington Y8 Both = male only (female measures NULL, sums skip)
    r = result[("Islington", 2024, "8", "Both")]
    assert (r.STUDENTS_TOTAL, r.STUDENTS_VACCINATED) == (50, 40)


def test_all_years_rollup(result):
    r = result[("Camden", 2024, "All", "Female")]
    assert (r.STUDENTS_TOTAL, r.STUDENTS_VACCINATED) == (220, 176)
    r = result[("Camden", 2024, "All", "Both")]
    assert (r.STUDENTS_TOTAL, r.STUDENTS_VACCINATED) == (310, 246)


def test_no_match_a1_total_semantics(result):
    # file3's A1 doesn't match the academic-year regex → NULL meta, rows kept
    r = result[("Camden", None, "8", "Female")]
    assert r.ACADEMIC_YEAR_TEXT is None
    assert (r.STUDENTS_TOTAL, r.STUDENTS_VACCINATED) == (10, 5)


def test_grain_is_full_cube(result):
    # every (borough, year) stratum carries Both and All rows
    for borough, year in {(k[0], k[1]) for k in result}:
        assert (borough, year, "All", "Both") in result


def test_rollup_consistency_invariant(result):
    # All/Both row equals the sum over base rows per (borough, year)
    import collections

    base_tot = collections.defaultdict(int)
    for k, r in result.items():
        if k[2] not in ("All",) and k[3] not in ("Both",):
            base_tot[(k[0], k[1])] += r.STUDENTS_TOTAL or 0
    for (borough, year), tot in base_tot.items():
        grand = result[(borough, year, "All", "Both")]
        assert (grand.STUDENTS_TOTAL or 0) == tot


def test_observe_metrics_on_pipeline(spark):
    """df.observe: production pipelines attach accumulator-style metrics
    to the lazy plan and read them after the action — no second scan."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    obs = Observation("stats")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"),
                          F.sum("v").alias("sum_v"))
    assert observed.filter(F.col("id") >= 0).count() == 1000
    assert obs.get["rows"] == 1000
    assert obs.get["sum_v"] == sum(i * 2 for i in range(1000))
