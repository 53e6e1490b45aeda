"""Edit-distance similarity join via deletion neighborhoods (round 5).

The blocked fuzzy join (brand block + levenshtein refine,
plans/scale_queries.py::fuzzy_blocked_pairs) is Σ|block|²/2 in
comparisons: lossless for output but quadratic in block size — at sf1
the 8k-per-brand blocks cost 800M banded-levenshtein calls. This module
replaces CANDIDATE GENERATION with the deletion-neighborhood equi-join
(the SymSpell scheme made distributed):

    ed(s, t) ≤ k  ⟹  Del≤k(s) ∩ Del≤k(t) ≠ ∅

where Del≤k(x) is the set of strings obtained by deleting up to k
characters. Proof sketch (completeness): take an optimal alignment of
s and t and let u be its matched-character subsequence; s reaches u by
deleting its substituted+deleted positions (≤ ed ≤ k deletions) and t
by deleting its substituted+inserted positions (≤ k) — so u is in both
neighborhoods. The converse is NOT implied (sharing a variant only
bounds ed ≤ 2k), which is fine: candidates are refined with the exact
banded levenshtein, so the OUTPUT is identical to the quadratic block
join (equality test-locked in tests/test_editjoin.py).

Scale shape: each record explodes to |Del≤2| = 1 + l + C(l,2) keys
(≤ ~80 for l ≤ 12) — an O(l²)-per-record index, the standard SymSpell
tradeoff, right for SHORT keys (names, codes, identifiers); for long
strings use segment/pass-join schemes instead. Candidates are whatever
actually collides on (block, variant) — near-linear on real name
corpora — versus Σ|block|²/2 always. Everything is native codegen
(substr/concat/transform), one equi-join shuffle, one pair-dedup
shuffle, then the refine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _del_at(s: Column, i: Column) -> Column:
    """Drop the 0-based i-th character of ``s`` (substr is 1-based)."""
    return F.concat(
        s.substr(F.lit(1), i), s.substr(i + F.lit(2), F.length(s))
    )


def deletion_neighborhood(name: str | Column, k: int = 2) -> Column:
    """All distinct strings reachable by deleting up to ``k`` (∈ {1,2})
    characters, including the string itself — a pure array expression."""
    if k not in (1, 2):
        raise ValueError("deletion_neighborhood supports k=1 or k=2")
    s = F.col(name) if isinstance(name, str) else name
    d1 = F.transform(
        F.sequence(F.lit(0), F.length(s) - 1), lambda i: _del_at(s, i)
    )
    out = F.concat(F.array(s), d1)
    if k == 2:
        d2 = F.flatten(
            F.transform(
                d1,
                lambda t: F.transform(
                    F.sequence(F.lit(0), F.length(t) - 1), lambda j: _del_at(t, j)
                ),
            )
        )
        out = F.concat(out, d2)
    return F.array_distinct(out)


def edit_candidate_pairs(
    a: DataFrame,
    b: DataFrame,
    key: str,
    name: str,
    block: str,
    k: int = 2,
    ordered: bool = True,
) -> DataFrame:
    """Candidate pairs (key_a, name_a, key_b, name_b) whose deletion
    neighborhoods collide within a block — a COMPLETE superset of the
    ed ≤ k pairs, to be refined by the caller's exact predicate.
    ``ordered=True`` keeps key_a < key_b (self-join); False keeps all
    cross pairs with key_a != key_b (two-frame matching)."""
    left = a.select(
        F.col(key).alias("key_a"),
        F.col(name).alias("name_a"),
        F.col(block).alias("__blk"),
        F.explode(deletion_neighborhood(name, k)).alias("__u"),
    )
    right = b.select(
        F.col(key).alias("key_b"),
        F.col(name).alias("name_b"),
        F.col(block).alias("__blk"),
        F.explode(deletion_neighborhood(name, k)).alias("__u"),
    )
    joined = left.join(right, ["__blk", "__u"])
    cond = (
        (F.col("key_a") < F.col("key_b"))
        if ordered
        else (F.col("key_a") != F.col("key_b"))
    )
    return (
        joined.filter(cond)
        .select(F.col("__blk").alias("block"), "key_a", "name_a", "key_b", "name_b")
        # dedup INCLUDES the block: with globally-unique keys it is
        # implied, but rep-level callers key on the NAME, which repeats
        # across blocks — a blockless dedup silently dropped every
        # block but one for a repeated name pair (r6 oracle catch)
        .dropDuplicates(["block", "key_a", "key_b"])
    )


def fuzzy_edit_pairs(
    df: DataFrame,
    key: str,
    name: str,
    block: str,
    max_edit: int = 2,
) -> DataFrame:
    """ed ≤ ``max_edit`` same-block pairs with the deletion-neighborhood
    candidate generator + exact banded-levenshtein refine. Output
    (block, key_a, key_b, edit_dist) is IDENTICAL to the quadratic
    block self-join (the length prefilter is subsumed — it was itself
    implied by the levenshtein threshold)."""
    cand = edit_candidate_pairs(df, df, key, name, block, k=max_edit)
    return (
        cand.withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b", max_edit)
        )
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= max_edit))
        .select("block", "key_a", "key_b", "edit_dist")
    )


def fuzzy_pairs_collapsed(
    df: DataFrame,
    key: str,
    name: str,
    block: str,
    max_edit: int = 2,
    generator: str = "join",
) -> DataFrame:
    """ed ≤ ``max_edit`` same-block pairs via IDENTICAL-NAME collapse
    (the tokset-collapse idea applied to fuzzy matching): mine name
    pairs over one representative per DISTINCT (block, name), then
    expand back through the members map. Output (block, key_a, key_b,
    edit_dist) is identical to the quadratic block self-join
    (test-locked): cross-group member pairs inherit their name pair's
    edit distance, within-group pairs are ed = 0 by definition.

    When to use which generator: attribute-style columns (product
    names, brands, codes) repeat heavily — reps ≈ a dimension table and
    this path does O(n) + Σ|rep-block|²/2 + output-size work (at sf1:
    64 distinct names across 200k parts → 51k rep comparisons instead
    of 800M). For high-cardinality short keys use
    :func:`fuzzy_edit_pairs` (deletion-neighborhood equi-join); the
    plain blocked join remains the simplest option for genuinely small
    blocks. All three are output-identical.

    ``generator`` picks how REP pairs are mined: ``"join"`` (default)
    is the rep-block self-join; ``"neighborhood"`` runs the SymSpell
    deletion-neighborhood equi-join over the reps — composing BOTH
    scale tricks (collapse first, pigeonhole second), the right shape
    when rep blocks are themselves large. Output identical either way
    (the refine is the same exact banded levenshtein).
    """
    members = df.select(
        F.col(block).alias("block"), F.col(name).alias("__nm"), F.col(key).alias("__k")
    )
    reps = members.groupBy("block", "__nm").agg(F.count(F.lit(1)).alias("__gn"))
    if generator == "neighborhood":
        rep_named = reps.select("block", "__nm")
        cand = edit_candidate_pairs(
            rep_named, rep_named, key="__nm", name="__nm", block="block",
            k=max_edit,
        )
        rep_pairs = (
            cand.withColumn(
                "edit_dist", F.levenshtein("name_a", "name_b", max_edit)
            )
            .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= max_edit))
            .select("block", "name_a", "name_b", "edit_dist")
        )
    elif generator == "join":
        a = reps.select("block", F.col("__nm").alias("name_a"))
        b = reps.select("block", F.col("__nm").alias("name_b"))
        rep_pairs = (
            a.join(b, "block")
            .filter(F.col("name_a") < F.col("name_b"))
            .withColumn("edit_dist", F.levenshtein("name_a", "name_b", max_edit))
            .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= max_edit))
        )
    else:
        raise ValueError(f"generator must be 'join'|'neighborhood', got {generator!r}")
    m_a = members.select(
        "block", F.col("__nm").alias("name_a"), F.col("__k").alias("ka")
    )
    m_b = members.select(
        "block", F.col("__nm").alias("name_b"), F.col("__k").alias("kb")
    )
    cross = (
        rep_pairs.join(m_a, ["block", "name_a"])
        .join(m_b, ["block", "name_b"])
        .select(
            "block",
            F.least("ka", "kb").alias("key_a"),
            F.greatest("ka", "kb").alias("key_b"),
            "edit_dist",
        )
    )
    within = (
        m_a.withColumnRenamed("name_a", "__nm")
        .join(
            m_b.withColumnRenamed("name_b", "__nm").withColumnRenamed("kb", "kb2"),
            ["block", "__nm"],
        )
        .filter(F.col("ka") < F.col("kb2"))
        .select(
            "block",
            F.col("ka").alias("key_a"),
            F.col("kb2").alias("key_b"),
            F.lit(0).alias("edit_dist"),
        )
    )
    return cross.unionByName(within)


def fuzzy_cross_edges_collapsed(
    a: DataFrame,
    b: DataFrame,
    key: str,
    name: str,
    block: str,
    max_edit: int = 2,
) -> DataFrame:
    """Two-frame variant of :func:`fuzzy_pairs_collapsed`: all (key_a ∈
    a, key_b ∈ b) same-block pairs with ed ≤ ``max_edit``, mined over
    distinct (block, name) reps of EACH side (identical-name rep pairs
    fall out of the refine at ed = 0 — no separate within branch).
    Returns (key_a, key_b); callers order/filter as needed."""
    ma = a.select(
        F.col(block).alias("block"), F.col(name).alias("__na"), F.col(key).alias("key_a")
    )
    mb = b.select(
        F.col(block).alias("block"), F.col(name).alias("__nb"), F.col(key).alias("key_b")
    )
    ra = ma.select("block", "__na").distinct()
    rb = mb.select("block", "__nb").distinct()
    rep_matches = ra.join(rb, "block").filter(
        F.levenshtein("__na", "__nb", max_edit) >= 0
    )
    return (
        rep_matches.join(ma, ["block", "__na"])
        .join(mb, ["block", "__nb"])
        .select("key_a", "key_b")
    )
