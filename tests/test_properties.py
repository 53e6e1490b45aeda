"""Property-based tests (hypothesis): the rollup and reshape invariants
hold for arbitrary inputs, not just the golden fixture (SURVEY §5.2.4).

Spark jobs per example are expensive — examples are capped low; the
properties still cover null measures, duplicate dimension values,
single-row frames, and adversarial ints.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hpv_etl_code_spark.operators.reshape import pivot, unpivot
from hpv_etl_code_spark.operators.rollup import cube_rollup_labeled

dims = st.sampled_from(["a", "b", "c"])
years = st.sampled_from(["8", "9", "10"])
genders = st.sampled_from(["Female", "Male"])
measures = st.one_of(st.none(), st.integers(min_value=-(10**6), max_value=10**6))

rows = st.lists(
    st.tuples(dims, years, genders, measures, measures),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows)
def test_rollup_totals_invariant(spark_session_holder, rows):
    """Grand-total row == sum over base rows, per fixed dim; 'Both' rows
    == Female+Male, per (dim, year)."""
    spark = spark_session_holder
    df = spark.createDataFrame(
        rows, "b string, y string, g string, t long, v long"
    )
    out = cube_rollup_labeled(
        df,
        fixed_dims=["b"],
        labeled_dims={"g": "Both", "y": "All"},
        aggs=[F.sum("t").alias("t"), F.sum("v").alias("v")],
    ).collect()
    by_key = {(r.b, r.y, r.g): (r.t, r.v) for r in out}

    # grand total per fixed dim — SQL semantics: NULL iff every input NULL
    for b in {r[0] for r in rows}:
        got_t, got_v = by_key[(b, "All", "Both")]
        t_inputs = [t for bb, _y, _g, t, _v in rows if bb == b and t is not None]
        v_inputs = [v for bb, _y, _g, _t, v in rows if bb == b and v is not None]
        assert got_t == (sum(t_inputs) if t_inputs else None)
        assert got_v == (sum(v_inputs) if v_inputs else None)

    # Both = Female + Male per (b, y) stratum
    for (b, y, g), (t, _v) in by_key.items():
        if g == "Both" and y != "All":
            t_inputs = [r[3] for r in rows if r[0] == b and r[1] == y and r[3] is not None]
            assert t == (sum(t_inputs) if t_inputs else None)


wide_rows = st.lists(
    st.tuples(
        st.text(alphabet="xyz", min_size=1, max_size=3),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda r: r[0],
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=wide_rows)
def test_unpivot_pivot_roundtrip_property(spark_session_holder, rows):
    spark = spark_session_holder
    wide = spark.createDataFrame(rows, "k string, m1 double, m2 double")
    long_df = unpivot(wide, ["k"], None, "var", "val")
    back = pivot(long_df, ["k"], "var", "val", ["m1", "m2"], strict=True)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, wide.collect()))
