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


# ------------------------------------------------------ as-of join fuzz

asof_keys = st.integers(min_value=0, max_value=2)
asof_ts = st.integers(min_value=0, max_value=50)
asof_left = st.lists(st.tuples(asof_keys, asof_ts), min_size=1, max_size=15)
asof_right = st.lists(
    st.tuples(asof_keys, asof_ts, st.integers(min_value=0, max_value=99)),
    min_size=0,
    max_size=15,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=asof_left, right=asof_right)
def test_asof_backward_matches_bruteforce(spark_session_holder, left, right):
    """For arbitrary (key, ts) fixtures, the union+window as-of equals
    the brute-force definition: the payload of the LATEST right row with
    right_ts <= left_ts per key (ties broken by taking that row whole)."""
    from hpv_etl_code_spark.operators.asof import asof_join_backward

    spark = spark_session_holder
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts long, lid long"
    )
    rdf = spark.createDataFrame(right, "k long, ts long, pay long")
    out = {
        r.lid: (r.ts_asof, r.pay_asof)
        for r in asof_join_backward(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="ts", payload=["ts", "pay"]
        ).collect()
    }
    # brute force in Python: latest right_ts <= left_ts; among equal
    # timestamps the window keeps the LAST right row in (ts, input) order
    for i, (k, t) in enumerate(left):
        cands = [(rt, pay) for (rk, rt, pay) in right if rk == k and rt <= t]
        if not cands:
            assert out[i] == (None, None), (i, out[i])
        else:
            best_ts = max(rt for rt, _ in cands)
            expect_pays = {pay for rt, pay in cands if rt == best_ts}
            got_ts, got_pay = out[i]
            assert got_ts == best_ts and got_pay in expect_pays, (
                i, out[i], best_ts, expect_pays,
            )
    assert len(out) == len(left)


# ------------------------------------------------------ xlsx parser fuzz

_text_cell = st.text(
    alphabet="abc xyz-#&<>'\"éü", min_size=1, max_size=12
).filter(lambda s: s.strip() != "")
cell = st.one_of(st.none(), st.integers(min_value=0, max_value=10**6), _text_cell)
header_row = st.lists(_text_cell, min_size=2, max_size=5)
data_rows = st.lists(st.lists(cell, min_size=1, max_size=6), min_size=1, max_size=5)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(a1=_text_cell, headers=header_row, data=data_rows, inline=st.booleans())
def test_xlsx_writer_parser_roundtrip(tmp_path_factory, a1, headers, data, inline):
    """Contract-valid grids with arbitrary cells (unicode, XML-special
    chars, blanks, numbers) survive the write→parse round trip
    cell-for-cell. (All-blank columns are unrepresentable in xlsx —
    blank cells are simply omitted — so headers are non-empty by the
    sheet contract.)"""
    import os

    from hpv_etl_code_spark.sources.sheets import _parse_sheet_xlsx
    from tests.xlsx_util import write_xlsx

    grid = [[a1], [], list(headers), *[list(r) for r in data]]
    d = tmp_path_factory.mktemp("fuzz_xlsx")
    path = os.path.join(str(d), "f.xlsx")
    write_xlsx(path, grid, inline=inline)
    with open(path, "rb") as f:
        raw = f.read()

    key = lambda t: tuple("" if x is None else str(x) for x in t)  # noqa: E731
    got = sorted(
        (
            (a1_text, borough, cat, v)
            for (_, a1_text, borough, cat, v) in _parse_sheet_xlsx("f", raw)
        ),
        key=key,
    )
    want = []
    for r in data:
        if not r or r[0] in (None, ""):
            continue
        for i, cat in enumerate(headers[1:], start=1):
            v = r[i] if i < len(r) else None
            want.append(
                (a1, str(r[0]), str(cat), None if v in (None, "") else str(v))
            )
    assert got == sorted(want, key=key)


# ---------------------------------------------- round-2 operator laws

vec_rows = st.lists(
    st.tuples(
        st.integers(0, 10_000),
        st.lists(
            st.floats(-1e3, 1e3, allow_nan=False, width=32), min_size=4, max_size=8
        ),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda r: r[0],
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=vec_rows)
def test_int8_quantization_error_bound(spark_session_holder, rows):
    """|v - dequantize(quantize(v))| ≤ scale/2 elementwise, always —
    the defining contract of round-to-nearest symmetric quantization."""
    from hpv_etl_code_spark.functions.vector import (
        dequantize,
        quantize_int8,
        quantize_scale,
        to_double_array,
    )

    spark = spark_session_holder
    df = spark.createDataFrame(rows, "vec_id LONG, v ARRAY<FLOAT>")
    out = (
        df.select("vec_id", to_double_array("v").alias("v"))
        .withColumn("scale", quantize_scale("v"))
        .withColumn("deq", dequantize(quantize_int8("v", F.col("scale")), F.col("scale")))
        .select(
            "vec_id",
            "scale",
            F.array_max(
                F.zip_with("v", "deq", lambda a, b: F.abs(a - b))
            ).alias("max_err"),
        )
        .collect()
    )
    for r in out:
        assert r["max_err"] <= r["scale"] / 2 + 1e-12, r


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Nd", "Zs"), max_codepoint=0x7F),
            max_size=60,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_pii_scrub_is_idempotent(spark_session_holder, texts):
    """scrub(scrub(x)) == scrub(x): placeholders must never re-match."""
    from hpv_etl_code_spark.operators.textops import scrub_pii

    spark = spark_session_holder
    df = spark.createDataFrame(
        [(i, t + " a.b@c.io 10.0.0.1 555-0100") for i, t in enumerate(texts)],
        "i LONG, t STRING",
    )
    out = df.select(
        scrub_pii("t").alias("once"),
        scrub_pii(scrub_pii("t")).alias("twice"),
    ).collect()
    for r in out:
        assert r["once"] == r["twice"]


# ----------------------------------------------------- layout properties

_keys = st.lists(
    st.integers(min_value=-(10**9), max_value=10**9),
    min_size=1,
    max_size=40,
    unique=True,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(keys=_keys, n_buckets=st.integers(min_value=1, max_value=9))
def test_global_index_is_the_sort_permutation(
    spark_session_holder, keys, n_buckets
):
    """For ANY unique key set and bucket count, the bucketed two-phase
    index equals the key's rank in sorted order (1-based, dense)."""
    from hpv_etl_code_spark.operators.layout import global_row_index

    spark = spark_session_holder
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r.k: r.global_idx
        for r in global_row_index(df, "k", n_buckets=n_buckets).collect()
    }
    want = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3"]),
            st.integers(min_value=-(10**9), max_value=10**9),
        ),
        min_size=1,
        max_size=30,
        unique=True,
    ),
    n_buckets=st.sampled_from([1, 2, 7]),
)
def test_grouped_index_is_the_per_group_sort_permutation(
    spark_session_holder, rows, n_buckets
):
    """For ANY (group, unique-key) set and bucket count, the grouped
    two-phase index equals the key's 1-based rank within its group."""
    from collections import defaultdict

    from hpv_etl_code_spark.operators.layout import grouped_row_index

    spark = spark_session_holder
    df = spark.createDataFrame(rows, "g string, k long")
    got = {
        (r.g, r.k): r.group_idx
        for r in grouped_row_index(df, group="g", key="k", n_buckets=n_buckets).collect()
    }
    per_group = defaultdict(list)
    for g, k in rows:
        per_group[g].append(k)
    want = {
        (g, k): i + 1
        for g, ks in per_group.items()
        for i, k in enumerate(sorted(ks))
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(10**6), max_value=10**6),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=1,
        max_size=30,
    ),
    n_buckets=st.sampled_from([1, 3, 8]),
)
def test_prefix_sum_is_the_running_total(spark_session_holder, rows, n_buckets):
    """For ANY (key, weight) multiset, the two-phase prefix sum equals
    the running total over the (key, id) sorted order."""
    from hpv_etl_code_spark.operators.layout import global_prefix_sum

    spark = spark_session_holder
    indexed = [(k, w, i) for i, (k, w) in enumerate(rows)]
    df = spark.createDataFrame(indexed, "k long, w long, id long")
    got = {
        r.id: r.cum_weight
        for r in global_prefix_sum(
            df, key="k", weight="w", n_buckets=n_buckets, tiebreak=("id",)
        ).collect()
    }
    cum = 0
    want = {}
    for k, w, i in sorted(indexed, key=lambda t: (t[0], t[2])):
        cum += w
        want[i] = cum
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.integers(min_value=-(10**6), max_value=10**6),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=1,
        max_size=30,
    ),
    n_buckets=st.sampled_from([1, 3, 8]),
)
def test_grouped_prefix_sum_is_the_per_group_running_total(
    spark_session_holder, rows, n_buckets
):
    """For ANY (group, key, weight) multiset, the grouped two-phase
    prefix sum equals the per-group running total in (key, id) order."""
    from collections import defaultdict

    from hpv_etl_code_spark.operators.layout import grouped_prefix_sum

    spark = spark_session_holder
    indexed = [(g, k, w, i) for i, (g, k, w) in enumerate(rows)]
    df = spark.createDataFrame(indexed, "g string, k long, w long, id long")
    got = {
        r.id: r.cum_weight
        for r in grouped_prefix_sum(
            df, group="g", key="k", weight="w", n_buckets=n_buckets, tiebreak=("id",)
        ).collect()
    }
    want = {}
    per_group = defaultdict(list)
    for g, k, w, i in indexed:
        per_group[g].append((k, i, w))
    for rows_g in per_group.values():
        cum = 0
        for k, i, w in sorted(rows_g, key=lambda t: (t[0], t[1])):
            cum += w
            want[i] = cum
    assert got == want


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for j in range(16):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=0xFFFF),
            st.integers(min_value=0, max_value=0xFFFF),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_morton_matches_bitwise_reference(spark_session_holder, pts):
    from hpv_etl_code_spark.operators.layout import morton_z16

    spark = spark_session_holder
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y", morton_z16(F.col("x"), F.col("y")).alias("z")).collect()
    for r in rows:
        assert r.z == _morton_ref(r.x, r.y)


# --- skyline: blocked shrink/refine ≡ brute-force dominance ------------

_sky_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**4),   # price (as int; cast)
        st.integers(min_value=1, max_value=50),      # size
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_sky_rows)
def test_skyline_matches_bruteforce_dominance(spark_session_holder, tmp_path_factory, rows):
    """The bucketed two-phase skyline must equal the quadratic
    NOT-EXISTS definition on arbitrary (price, size) multisets —
    including duplicate points (ties all survive) and single-bucket
    degenerate ranges."""
    import os

    from hpv_etl_code_spark.plans.olap_queries import skyline_parts

    spark = spark_session_holder
    data = [
        (i + 1, float(p), s) for i, (p, s) in enumerate(rows)
    ]
    expected = {
        (pk, p, s)
        for (pk, p, s) in data
        if not any(
            (q >= p and t <= s and (q > p or t < s)) for (_, q, t) in data
        )
    }
    d = tmp_path_factory.mktemp("sky")
    spark.createDataFrame(
        data, "p_partkey long, p_retailprice double, p_size int"
    ).write.mode("overwrite").parquet(os.path.join(str(d), "part.parquet"))
    got = {
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in skyline_parts(spark, str(d)).collect()
    }
    assert got == expected


# --- interval union: coverage invariants -------------------------------

_iv_offsets = st.lists(
    st.integers(min_value=0, max_value=5000), min_size=1, max_size=30
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(offsets=_iv_offsets)
def test_interval_union_matches_bruteforce(spark_session_holder, tmp_path_factory, offsets):
    """covered_secs must equal the size of the set-union of the
    intervals and n_spans the number of its connected components —
    checked against a literal second-by-interval union in Python."""
    import datetime as dt
    import os

    from hpv_etl_code_spark.plans.temporal_graph_queries import (
        WINDOW_SECONDS,
        interval_union_length,
    )

    spark = spark_session_holder
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=s), 1, "x", 0.0, "{}")
        for i, s in enumerate(offsets)
    ]
    # brute force: merge sorted half-open intervals
    ivs = sorted((s, s + WINDOW_SECONDS) for s in offsets)
    spans = []
    for s, e in ivs:
        if spans and s <= spans[-1][1]:
            spans[-1] = (spans[-1][0], max(spans[-1][1], e))
        else:
            spans.append((s, e))
    d = tmp_path_factory.mktemp("iv")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(str(d), "events.parquet"))
    r = interval_union_length(spark, str(d)).collect()[0]
    assert r.n_spans == len(spans)
    assert r.covered_secs == sum(e - s for s, e in spans)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab xyz\t.é"),
            max_size=24,
        ),
        min_size=1,
        max_size=6,
    ),
    w=st.integers(min_value=2, max_value=4),
)
def test_shingles_match_python_reference(spark, texts, w):
    """operators/textops.py::shingles vs a direct Python reference over
    adversarial text (repeated separators, tabs, unicode, empties):
    the Spark expression must produce the same DISTINCT w-gram SET as
    python's split-on-single-space — the exact contract the DuckDB
    shingle oracle assumes (string_split semantics: consecutive
    separators yield empty tokens)."""
    from pyspark.sql import functions as F

    from hpv_etl_code_spark.operators.textops import shingles

    def ref(t: str) -> set[str]:
        tk = t.split(" ")  # NOT split() — single-space, like the engines
        return {
            " ".join(tk[i : i + w]) for i in range(0, max(len(tk) - w + 1, 0))
        }

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: set(r.sh)
        for r in df.select("doc_id", shingles("text", w).alias("sh")).collect()
    }
    want = {i: ref(t) for i, t in enumerate(texts)}
    assert got == want
