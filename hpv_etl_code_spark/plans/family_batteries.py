"""Union-tagged FAMILY BATTERIES — one driver-gate slot certifies a whole
operator family (VERDICT r6 #1).

Problem: the driver's correctness gate hash-checks a bounded ~50-entry
window per round, so the long tail of granular catalog entries (175
oracle-backed entries after round 6) would need ~25 more rounds to each
get a driver-level check. Fix (prescribed by the round-6 verdict):
consolidate the never-driver-checked tail into union-tagged batteries —
each battery runs SEVERAL granular sibling entries, tags every row with
the sibling's name, prefixes the sibling's columns (``<sib>__<col>``)
so heterogeneous schemas union losslessly (missing columns NULL-padded
on both engines), and unions the lot. One battery in the gate window
therefore hash-certifies every sibling's full result set at once.

Equivalence is BY CONSTRUCTION on the Spark side — the battery calls
the registered sibling callables themselves (no re-implementation), so
a battery passing its oracle implies each sibling's exact rows matched
that sibling's own oracle (the battery oracle is the UNION ALL BY NAME
of the sibling oracles, identically tagged/prefixed). A pinning test
(tests/test_family_batteries.py) additionally re-derives sibling rows
from battery rows for a sample of batteries.

The sibling lists + generated oracle SQL live in ``battery_specs.py``
(written by ``scripts/make_batteries.py`` — re-run it after changing a
sibling's output schema; the specs are committed so imports never need
Spark at codegen time).

Scale shape: a battery is exactly the union of its siblings' plans —
no extra shuffle, no collect; Spark evaluates each branch independently
and the union is a no-exchange concatenation. At 100 TB each sibling's
own scale story (documented at its definition site) is unchanged.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .battery_specs import BATTERY_SPECS


def _norm(df: DataFrame, c: str):
    """NULL-padding-stable projection of a sibling column. Booleans and
    dates pad inconsistently through the driver's pandas canonicalizer
    (Spark object/None vs DuckDB bool->NaN / datetime64->NaT), so both
    sides of the battery present bool as INT and date as VARCHAR — the
    generated oracle (scripts/make_batteries.py) applies the identical
    casts. Every other type stringifies NULL identically on both
    engines (measured in the round-7 codegen verify pass)."""
    dt = df.schema[c].dataType
    if isinstance(dt, T.BooleanType):
        return df[c].cast("int")
    if isinstance(dt, T.DateType):
        return df[c].cast("string")
    return df[c]


def _battery_fn(siblings: tuple[str, ...]):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .. import catalog

        es = catalog.entries()
        dfs = []
        for sib in siblings:
            df = es[sib].fn(spark, sf_dir)
            dfs.append(
                df.select(
                    F.lit(sib).alias("entry"),
                    *[_norm(df, c).alias(f"{sib}__{c}") for c in df.columns],
                )
            )
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
        )

    return fn


def battery_siblings() -> dict[str, tuple[str, ...]]:
    """battery name -> granular sibling entries it certifies."""
    return {name: tuple(spec["siblings"]) for name, spec in BATTERY_SPECS.items()}


def register_entries(register) -> None:  # noqa: ANN001 — see catalog.register
    for name, spec in BATTERY_SPECS.items():
        register(name, _battery_fn(tuple(spec["siblings"])), spec["oracle"])
