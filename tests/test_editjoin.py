"""Deletion-neighborhood edit join: candidates must be COMPLETE (every
ed ≤ 2 same-block pair collides on a deletion variant) and the refined
output must equal the quadratic block self-join exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpv_etl_code_spark.operators.editjoin import (
    deletion_neighborhood,
    fuzzy_edit_pairs,
)
from hpv_etl_code_spark.sources.registry import load_table


def _brute(df, key, name, block, max_edit=2):
    a = df.select(
        F.col(key).alias("key_a"), F.col(name).alias("name_a"), F.col(block).alias("block")
    )
    b = df.select(
        F.col(key).alias("key_b"), F.col(name).alias("name_b"), F.col(block).alias("block")
    )
    return (
        a.join(b, "block")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b", max_edit))
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= max_edit))
        .select("block", "key_a", "key_b", "edit_dist")
    )


def test_neighborhood_contains_self_and_deletions(spark):
    row = spark.createDataFrame([("abcd",)], ["s"]).select(
        deletion_neighborhood("s", 2).alias("n")
    ).first()
    n = set(row.n)
    assert "abcd" in n and "bcd" in n and "acd" in n and "abd" in n and "abc" in n
    assert "ab" in n and "cd" in n and "bd" in n  # two deletions
    assert all(len(x) >= 2 for x in n)


def test_edit_join_equals_brute_on_parts(spark, sf_dir):
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand")
    fast = fuzzy_edit_pairs(p, "p_partkey", "p_name", "p_brand")
    brute = _brute(p, "p_partkey", "p_name", "p_brand")
    rows = lambda df: {tuple(r) for r in df.collect()}
    got = rows(fast)
    assert got == rows(brute) and got


def test_edit_join_equals_brute_on_mutations(spark):
    """Synthetic corpus with KNOWN substitutions, insertions, deletions,
    transpositions and combinations at distances 0..3 — distances ≤ 2
    must all be found, > 2 must not."""
    base = "kampala"
    rows = [
        (1, base, "B"),
        (2, base, "B"),                 # ed 0
        (3, "kampela", "B"),            # 1 substitution
        (4, "kampal", "B"),             # 1 deletion
        (5, "kampalas", "B"),           # 1 insertion
        (6, "akmpala", "B"),            # transposition = 2 edits
        (7, "kmpela", "B"),             # deletion + substitution = 2
        (8, "xampela", "B"),            # 2 substitutions... vs base
        (9, "xyzpela", "B"),            # 3+ edits from base
        (10, base, "C"),                # other block — never paired with B
    ]
    df = spark.createDataFrame(rows, ["k", "s", "blk"])
    fast = fuzzy_edit_pairs(df, "k", "s", "blk")
    brute = _brute(df, "k", "s", "blk")
    rowset = lambda d: {tuple(r) for r in d.collect()}
    got = rowset(fast)
    assert got == rowset(brute)
    pairs = {(a, b): e for _, a, b, e in got}
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == 1 and pairs[(1, 4)] == 1 and pairs[(1, 5)] == 1
    assert pairs[(1, 6)] == 2 and pairs[(1, 7)] == 2
    assert (1, 9) not in pairs
    assert not any(10 in (a, b) and a != 10 and b != 10 for a, b in pairs)


def test_collapsed_join_equals_brute_on_parts(spark, sf_dir):
    from hpv_etl_code_spark.operators.editjoin import fuzzy_pairs_collapsed

    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand")
    fast = fuzzy_pairs_collapsed(p, "p_partkey", "p_name", "p_brand")
    brute = _brute(p, "p_partkey", "p_name", "p_brand")
    rows = lambda df: {tuple(r) for r in df.collect()}
    got = rows(fast)
    assert got == rows(brute) and got


def test_collapsed_join_equals_brute_on_mutations(spark):
    from hpv_etl_code_spark.operators.editjoin import fuzzy_pairs_collapsed

    rows = [
        (1, "kampala", "B"), (2, "kampala", "B"), (3, "kampela", "B"),
        (4, "kampal", "B"), (5, "kampalas", "B"), (6, "akmpala", "B"),
        (7, "kmpela", "B"), (8, "xyzqrs", "B"), (9, "kampala", "C"),
        (10, "kampela", "B"),  # duplicate of 3's name — exercises gn>1 groups
    ]
    df = spark.createDataFrame(rows, ["k", "s", "blk"])
    fast = fuzzy_pairs_collapsed(df, "k", "s", "blk")
    brute = _brute(df, "k", "s", "blk")
    rowset = lambda d: {tuple(r) for r in d.collect()}
    assert rowset(fast) == rowset(brute) and rowset(fast)
