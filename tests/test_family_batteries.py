"""Family batteries (plans/family_batteries.py) — the VERDICT r6 #1
done-criteria: battery ≡ union-of-siblings, sibling lists stay valid,
and the driver-gate window actually condenses the never-checked tail.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from hpv_etl_code_spark import catalog
from hpv_etl_code_spark.plans.battery_specs import BATTERY_SPECS
from hpv_etl_code_spark.plans.family_batteries import _norm, battery_siblings


def test_specs_reference_registered_oracle_backed_entries():
    es = catalog.entries()
    seen: dict[str, str] = {}
    for name, sibs in battery_siblings().items():
        assert name in es and es[name].oracle is not None
        assert len(sibs) >= 2, name
        for s in sibs:
            assert s in es, (name, s)
            assert es[s].oracle is not None, (name, s)
            assert s not in BATTERY_SPECS, f"battery nested in battery: {s}"
            # a sibling certified by two batteries would double its gate
            # cost for no coverage gain
            assert s not in seen, (s, name, seen[s])
            seen[s] = name


def test_oracle_tags_match_siblings():
    """The generated oracle must tag exactly the sibling list, in order
    (guards a stale battery_specs.py after a sibling rename)."""
    for name, spec in BATTERY_SPECS.items():
        import re

        tagged = [
            m.group(1)
            for line in spec["oracle"].splitlines()
            if (m := re.match(r"^SELECT '(\w+)' AS entry, ", line))
        ]
        assert tagged == list(spec["siblings"]), name


@pytest.mark.parametrize("battery", ["tpch_battery_c", "governance_battery"])
def test_battery_equals_union_of_siblings(spark, sf_dir, battery):
    """Pin the construction: slicing a battery by its entry tag and
    un-prefixing the columns reproduces the sibling's own result
    (bool→int / date→string normalization applied, as documented)."""
    es = catalog.entries()
    bat = es[battery].fn(spark, sf_dir)
    for sib in BATTERY_SPECS[battery]["siblings"]:
        sdf = es[sib].fn(spark, sf_dir)
        expect = sdf.select(
            *[_norm(sdf, c).alias(c) for c in sdf.columns]
        )
        got = bat.filter(F.col("entry") == sib).select(
            *[F.col(f"{sib}__{c}").alias(c) for c in sdf.columns]
        )
        # nullability flips through the NULL-padded union; names+types
        # must survive exactly
        assert [(f.name, f.dataType) for f in got.schema] == [
            (f.name, f.dataType) for f in expect.schema
        ], sib
        sym = got.exceptAll(expect).count() + expect.exceptAll(got).count()
        assert sym == 0, f"{battery}/{sib}: {sym} differing rows"


def test_batteries_condense_the_never_checked_tail():
    """Effective driver coverage: every oracle-backed entry is either
    (a) already in a CORRECTNESS_r*.json ledger, (b) covered by a
    checked battery (battery ≡ union-of-siblings), or (c) scheduled in
    the current gate window. Round 8 (VERDICT r7 #2) tightened the
    round-6 '< 100' criterion to ZERO: the battery-aware ledger
    (catalog._ledger_last_checked propagates a battery's check round to
    its siblings) stops the rotation from wasting slots on
    already-certified siblings, so the full oracle-backed catalog is
    driver-certified once the current window lands."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(p) as fh:
            checked |= set(json.load(fh))
    window = set(catalog._PRIORITY) | set(catalog._rotation_window())
    covered = set(checked) | window
    for bat, sibs in battery_siblings().items():
        if bat in covered:
            covered |= set(sibs)
    es = catalog.entries()
    oracle_backed = {n for n, e in es.items() if e.oracle is not None}
    remaining = sorted(oracle_backed - covered)
    assert remaining == [], (len(remaining), remaining[:20])
