"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The LLM-pipeline dedup family (north star, BASELINE.json). Scale design:

- **Exact** dedup is a hash aggregation on a content fingerprint — one
  shuffle on the md5 key, deterministic keeper (min id).
- **MinHash+LSH** is the classic shingle → k-minhash signature → band →
  bucket-join pipeline: only documents sharing a band bucket are ever
  compared, so cost is O(candidates), not O(n²). Signatures are computed
  with native array expressions (``transform`` + ``xxhash64``) — no UDFs,
  no MLlib vector materialization. Hot buckets (skewed bands) are the
  known failure mode at 100 TB; ``max_bucket`` caps them (dropping
  pathological buckets is standard practice — they're near-duplicates of
  *everything*, e.g. boilerplate).
- **SimHash** is a 64-bit weighted bit-vote fingerprint; near-dup pairs
  come from 16-bit band buckets then a Hamming-distance filter
  (``bit_count(a XOR b)``) — same bucket-join scaling story.

All hash functions are Spark-native (xxhash64); the LSH/SimHash entries
are therefore rows-only in the driver gate (no DuckDB twin — hash
algorithms differ), with invariant/recall tests in
``tests/test_dedup.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import distinct_tokens, fingerprint_md5, tokens


# ------------------------------------------------------------- exact

def exact_dedup_keepers(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """Group by content fingerprint; keep the minimum id (deterministic,
    unlike ``dropDuplicates`` which keeps an arbitrary row)."""
    return (
        df.withColumn("fingerprint", fingerprint_md5(content_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def dedup_exact(df: DataFrame, subset: Sequence[str], id_col: str) -> DataFrame:
    """Exact dedup on a column subset with deterministic survivor."""
    w_cols = [F.col(c) for c in subset]
    return (
        df.groupBy(*w_cols)
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_dups"))
    )


# ------------------------------------------------------ jaccard utils

def jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard over two (distinct-element) arrays, as a double."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter * 1.0 / F.greatest(union, F.lit(1))


def _est_jaccard(sig_a: str, sig_b: str, num_hashes: int) -> Column:
    """Estimated Jaccard from two MinHash signatures: the fraction of
    matching positions over the first ``num_hashes`` entries (the seeded
    family has the prefix property, so a persisted signature wider than
    the banding width serves it exactly — est must compare the same
    prefix it divides by).

    NEGATIVE RESULT pinned here (optimization round 9, guide §1.1 "a
    fresh implementation of the ideal plan is usually slower because of
    some gotcha"): unrolling this into a ``sig_a[0]==sig_b[0] + ... +
    sig_a[k-1]==sig_b[k-1]`` scalar chain to avoid the four intermediate
    array allocations looked strictly cheaper on paper but measured
    dedup_minhash_lsh at sf0.1 4× SLOWER (isolated median 4.57 s →
    19.2 s, same box, back-to-back): at k = 35 the inlined compare chain
    bloats the fused refine stage's generated method past the JIT's
    huge-method bytecode limit, so the whole refine pipeline drops to
    interpreted execution — far worse than the allocations it saved.
    The array formulation stays."""
    return (
        F.size(
            F.filter(
                F.zip_with(
                    F.slice(sig_a, 1, num_hashes),
                    F.slice(sig_b, 1, num_hashes),
                    lambda x, y: x == y,
                ),
                lambda m: m,
            )
        )
        * 1.0
        / F.lit(num_hashes)
    )


# ----------------------------------------------------- MinHash + LSH

def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """k independent min-hashes via seeded xxhash64 over the shingle set —
    an array expression evaluated inside codegen, one pass per row.
    Works on any element type (xxhash64 is polymorphic); feed it hashed
    shingles (longs) for the cheapest inner loop.

    Gotcha encoded here: the per-seed lambda MUST take exactly one
    parameter — pyspark binds a two-parameter lambda as (element, index),
    so a ``lambda s, seed=seed`` default silently becomes the array index
    and every signature position degenerates to the same hash."""

    def _seeded(seed: int):
        lit = F.lit(seed)
        return lambda s: F.xxhash64(s, lit)

    sigs = [
        F.array_min(F.transform(shingles, _seeded(seed)))
        for seed in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 200,
    hot_bucket_mode: str = "chunk",
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact Jaccard ≥ threshold,
    candidate-generated by LSH banding (b bands × r = k/b rows).

    Hot buckets (> ``max_bucket`` members — boilerplate clusters) are the
    straggler risk: one bucket's m²/2 pair generation lands on ONE task.
    ``hot_bucket_mode``:

    - ``"chunk"`` (default): split each hot bucket into
      ceil(m/max_bucket) chunks by id-hash; the probe side replicates
      per-bucket by that factor, so the pair work spreads across chunks²
      tasks — complete output, bounded per-task cost (the manual analog
      of AQE's skew-join splitting, applied to self-join pair explosion).
    - ``"drop"``: discard hot buckets entirely (the classic
      boilerplate-killer heuristic — members are near-dups of
      *everything*, often noise at corpus scale).

    Output: (id_a, id_b, est_jaccard, jaccard).
    """
    # shingles are hashed to longs up front: every downstream compare
    # (minhash, band key, exact intersect) runs on fixed-width ints, not
    # strings — the hot loops stay cheap. Collision odds ~|doc|²/2⁶⁴ ≈ 0.
    base = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(distinct_tokens(text_col), lambda t: F.xxhash64(t))
        ).alias("toks"),
    ).withColumn("sig", minhash_signature(F.col("toks"), num_hashes))
    return minhash_lsh_pairs_from_base(
        base,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        max_bucket=max_bucket,
        hot_bucket_mode=hot_bucket_mode,
    )


def minhash_lsh_pairs_from_base(
    base: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 200,
    hot_bucket_mode: str = "chunk",
) -> DataFrame:
    """:func:`minhash_lsh_pairs` over an ALREADY-SIGNED base frame
    ``(id, toks, sig)`` — toks hashed to longs, sig a
    :func:`minhash_signature` of matching ``num_hashes``.

    This is the shared-computation seam: several pipeline entries need
    LSH pairs over (a subset of) the same corpus, and the token/signature
    stage is the expensive narrow prefix. Sign the corpus once (e.g.
    :func:`build_corpus_index`, or a persisted/cached enriched frame),
    then run banding + candidate join + Jaccard refine from the shared
    base — at 100 TB the signed base is the parquet artifact every batch
    job reads instead of re-hashing the corpus. See
    :func:`minhash_lsh_pairs_grouped` for the identical-tokset-collapsed
    variant (same output, m²-cheaper on boilerplate-heavy corpora).
    """
    return _lsh_pairs_uncollapsed(
        base,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        max_bucket=max_bucket,
        hot_bucket_mode=hot_bucket_mode,
    )


def _next_decade(n: int) -> int:
    """Smallest power of ten ≥ max(n, 1) — the shared rounding step of
    :func:`scaled_lsh_params` and ``similarity.scaled_ann_params``."""
    decade = 10
    while decade < max(n, 1):
        decade *= 10
    return decade


def _length_ratio_prefilter(
    cand: DataFrame,
    payload: DataFrame,
    key_col: str,
    a_col: str,
    b_col: str,
    threshold: float,
) -> DataFrame:
    """EXACT narrow prefilter on candidate pairs before token payloads
    attach: J ≥ t ⟹ |∩| ≥ t·|∪| ≥ t·max and |∩| ≤ min, so
    min ≥ t·max — a failing pair cannot pass the refine. The 1e-6
    margin keeps the filter sound against the refine's ROUND(J, 6)
    comparison (a pair at raw J ∈ [t − 5e-7, t) rounds UP into the
    output on both engines, and its size ratio may sit just below t).
    ``payload`` must carry (key_col, toks)."""
    sizes = payload.select(key_col, F.size("toks").alias("__sz"))
    return (
        cand.join(sizes.toDF(a_col, "__sza"), a_col)
        .join(sizes.toDF(b_col, "__szb"), b_col)
        .filter(
            F.least("__sza", "__szb") * 1.0
            >= F.lit(max(threshold - 1e-6, 0.0)) * F.greatest("__sza", "__szb")
        )
        .select(a_col, b_col)
    )


def _sig_width_guarded(sig_col: str, num_hashes: int) -> Column:
    """The signature column, runtime-asserted to be at least
    ``num_hashes`` wide (ADVICE r8): banding against a PERSISTED index
    narrower than the requested width would silently truncate band keys
    (``F.slice`` returns the short prefix) and null-pad the est
    comparison — degraded recall with no error. The prefix property
    makes narrower-than-index banding exact, so the guard only fires on
    the genuinely broken direction. Evaluates per GROUP row (a length
    compare — negligible next to the hashes themselves)."""
    return F.when(
        F.size(sig_col) >= num_hashes, F.col(sig_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"{sig_col}: persisted signature width "
                ),
                F.size(sig_col).cast("string"),
                F.lit(
                    f" < requested num_hashes {num_hashes} — rebuild the "
                    "index with a wider signature or band with num_hashes "
                    "<= the index width (build_corpus_index docstring)"
                ),
            )
        )
    )


def _pinned_wide(cand: DataFrame, key: str) -> DataFrame:
    """Pin the payload-attach partitioning 8× the session shuffle
    parallelism (the AQE fan-out blindspot: candidate rows are narrow
    pre-join, ~100× wider once both token arrays attach)."""
    try:
        shuffle_p = int(
            cand.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):
        shuffle_p = cand.sparkSession.sparkContext.defaultParallelism
    return cand.repartition(shuffle_p * 8, key)


def tokset_groups(base: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Collapse a signed base ``(id, toks, sig)`` to identical-tokset
    groups. Returns ``(members, groups)``: members maps each id to its
    group key ``gkey = xxhash64(array_sort(toks))``; groups holds one
    row per distinct tokset ``(gkey, gn, toks, sig)``. ``first(toks)``
    is deterministic here — every member of a group carries the SAME
    tokset, hence the same MinHash signature. Callers should persist
    ``groups`` (it is referenced many times by the LSH plan; at 100 TB
    it is a parquet artifact next to the signed base). A precomputed
    ``gkey`` column on ``base`` (e.g. from a persisted enriched frame)
    is reused as-is.

    Collision tradeoff: ``gkey`` is a 64-bit xxhash64, so by the
    birthday bound distinct toksets start colliding (and would silently
    merge) around ~2³² ≈ 4 B distinct toksets. At that scale swap the
    key to a 128-bit digest — ``md5(to_json(array_sort(toks)))`` — at
    the cost of a 16-byte shuffle key; the rest of the plan is
    unchanged. The default keeps the 8-byte key because every corpus
    this engine is benched on is orders of magnitude below the bound."""
    if "gkey" in base.columns:
        keyed = base.select("id", "toks", "sig", "gkey")
    else:
        keyed = base.select(
            "id", "toks", "sig", F.xxhash64(F.array_sort("toks")).alias("gkey")
        )
    members = keyed.select("id", "gkey")
    groups = keyed.groupBy("gkey").agg(
        F.count(F.lit(1)).alias("gn"),
        F.first("toks").alias("toks"),
        F.first("sig").alias("sig"),
    )
    return members, groups


def minhash_lsh_pairs_grouped(
    members: DataFrame,
    groups: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 200,
    fan_partitions: int | None = None,
) -> DataFrame:
    """MinHash+LSH pair mining over an identical-tokset-collapsed corpus
    (see :func:`tokset_groups`): mine pairs over ONE representative per
    distinct tokset, then expand group pairs back to member pairs.

    Output-equivalent to :func:`minhash_lsh_pairs_from_base` in
    ``chunk`` mode (verified pair-for-pair in tests/test_dedup.py):
    identical toksets imply identical signatures, so group collision
    structure, est_jaccard and jaccard are all unchanged; within-group
    member pairs (jaccard exactly 1 ≥ any threshold, est 1) share every
    band bucket by construction and are emitted directly. Hot-bucket
    classification stays faithful by weighting rep bucket counts with
    group size ``gn``.

    Why it matters at 100 TB: near-dup corpora are exactly the ones
    with heavy boilerplate repetition, and every m-member identical
    cluster shrinks the quadratic band-bucket/candidate/refine work by
    m² while adding only two expansion joins over the members map.
    (``drop`` mode is deliberately NOT offered here: it discards pairs
    whose every shared bucket is hot, and an identical mega-cluster —
    all band buckets shared, all hot — is precisely the boilerplate
    ``drop`` intends to kill; collapsing would resurrect its
    within-cluster pairs. Pair LISTING over such a cluster is also
    inherently quadratic in the OUTPUT — for removal at scale use
    :func:`lsh_dedup_keepers`-style survivor logic instead.)
    """
    rep_base = groups.select(
        F.col("gkey").alias("id"), "toks", "sig", F.col("gn").alias("_w")
    )
    rep_pairs = _lsh_pairs_uncollapsed(
        rep_base,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        max_bucket=max_bucket,
        hot_bucket_mode="chunk",
        weight_col="_w",
        fan_partitions=fan_partitions,
    )
    m_a = members.select(F.col("gkey").alias("id_a"), F.col("id").alias("ma"))
    m_b = members.select(F.col("gkey").alias("id_b"), F.col("id").alias("mb"))
    cross = (
        rep_pairs.join(m_a, "id_a")
        .join(m_b, "id_b")
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
            "est_jaccard",
            "jaccard",
        )
    )
    # ADVICE r4: the within-group fast path asserts jaccard=1, but the
    # flat path computes jaccard([],[]) = 0 (via greatest(union,1)) and
    # drops empty-tokset pairs for any threshold > 0 — so empty-tokset
    # groups (whitespace-only docs) are excluded here to keep the
    # output-equivalence contract exact. (Assumes threshold in (0,1],
    # the only meaningful range for near-dup mining.)
    nonempty = groups.filter(F.size("toks") > 0).select("gkey")
    within = (
        members.join(nonempty, "gkey", "left_semi")
        .select("gkey", F.col("id").alias("id_a"))
        .join(members.select("gkey", F.col("id").alias("id_b")), "gkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.lit(1.0).alias("est_jaccard"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(within)


def _doomed_from_rep_pairs(
    members: DataFrame,
    groups: DataFrame,
    rep_pairs: DataFrame,
    ga: str,
    gb: str,
) -> DataFrame:
    """Non-survivors of greedy lowest-id-wins dedup, computed WITHOUT
    expanding group pairs to member pairs (optimization round 9).

    The survivor consumers (corpus pipeline, dedup front door) only
    need ``distinct id_b`` of the pair listing, but the grouped miners
    materialize every member pair first — within an m-member
    identical-tokset cluster that is m² rows for what reduces to
    "everyone but the minimum" (the sf0.1 pair listing is 2.5M rows
    for a 5k-doc corpus). Computed directly:

    - WITHIN a nonempty group, pair (a, b) with a < b dooms b ⇔ every
      member above the group minimum is doomed.
    - ACROSS a refined rep pair (ga, gb), member pair (ma, mb) dooms
      ``greatest(ma, mb)`` ⇔ a member m of ga is doomed iff some
      partner member is smaller, i.e. iff ``m > min(members(gb))``;
      over all partners, iff m exceeds the smallest partner-group
      minimum. (Rep pairs are refined BEFORE expansion — every member
      pair of a surviving rep pair passes the threshold — so no
      per-member jaccard is lost by deciding at group level.)

    Both rules are "id exceeds a per-group floor", and a member is
    doomed iff it exceeds EITHER floor ⇔ iff it exceeds their MINIMUM —
    so the within-floor (own group min, nonempty groups only) and the
    partner floors union into ONE per-group threshold aggregate, and
    the doom decision is a single members join + filter. Member ids
    are unique, so the filter output needs no distinct — the old
    two-branch ``within ∪ cross → distinct`` shape paid a second
    members join plus a dedup exchange for the same set.

    Mirroring detail (guide §2.4): the partner floors come from joining
    the per-group minima onto the rep pairs and exploding a 2-element
    struct array — ROW-LOCAL. The earlier ``rep_pairs.select(ga, gb) ∪
    select(gb, ga)`` union re-evaluated the ENTIRE rep-pair lineage
    (banding explode, candidate self-join, pair dedup, payload attach,
    est+jaccard refine) once per branch, since exchange reuse does not
    fire across re-aliased branches — measured at sf0.1 as ~150 s of
    the corpus pipeline's ~190 s total executor time.

    Output-equal to ``pairs.select(id_b).distinct()`` by the argument
    above (ids are unique across groups, so all comparisons are
    strict); pinned by tests/test_dedup.py::test_doomed_equals_pair_listing.
    Linear in members + rep pairs instead of quadratic in cluster
    sizes.
    """
    gmin = members.groupBy("gkey").agg(F.min("id").alias("gmin"))
    own_floor = (
        groups.filter(F.size("toks") > 0)
        .select("gkey")
        .join(gmin, "gkey")
        .select("gkey", F.col("gmin").alias("pmin"))
    )
    partner_floors = (
        rep_pairs.join(
            gmin.select(F.col("gkey").alias(ga), F.col("gmin").alias("_min_a")),
            ga,
        )
        .join(
            gmin.select(F.col("gkey").alias(gb), F.col("gmin").alias("_min_b")),
            gb,
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(ga).alias("gkey"), F.col("_min_b").alias("pmin")
                    ),
                    F.struct(
                        F.col(gb).alias("gkey"), F.col("_min_a").alias("pmin")
                    ),
                )
            ).alias("pm")
        )
        .select("pm.gkey", "pm.pmin")
    )
    thr = (
        own_floor.unionByName(partner_floors)
        .groupBy("gkey")
        .agg(F.min("pmin").alias("thr"))
    )
    return (
        members.join(thr, "gkey")
        .filter(F.col("id") > F.col("thr"))
        .select("id")
    )


def lsh_doomed_grouped(
    members: DataFrame,
    groups: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 200,
    fan_partitions: int | None = None,
) -> DataFrame:
    """Greedy lowest-id-wins doomed set for the FAST (xxhash64) grouped
    family — ``minhash_lsh_pairs_grouped(...).select('id_b').distinct()``
    without the member-pair expansion (see :func:`_doomed_from_rep_pairs`)."""
    rep_base = groups.select(
        F.col("gkey").alias("id"), "toks", "sig", F.col("gn").alias("_w")
    )
    rep_pairs = _lsh_pairs_uncollapsed(
        rep_base,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        max_bucket=max_bucket,
        hot_bucket_mode="chunk",
        weight_col="_w",
        fan_partitions=fan_partitions,
    )
    return _doomed_from_rep_pairs(
        members, groups, rep_pairs.select("id_a", "id_b"), "id_a", "id_b"
    )


def lsh_doomed_portable_grouped(
    members: DataFrame,
    groups: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Greedy lowest-id-wins doomed set for the PORTABLE (md5) grouped
    family — the :func:`minhash_lsh_pairs_portable_grouped` pair listing
    reduced to ``distinct id_b`` without expansion."""
    rep_pairs = portable_rep_pairs(groups, threshold, num_hashes, bands)
    return _doomed_from_rep_pairs(
        members, groups, rep_pairs, "gkey_a", "gkey_b"
    )


def _lsh_pairs_uncollapsed(
    base: DataFrame,
    threshold: float,
    num_hashes: int,
    bands: int,
    max_bucket: int,
    hot_bucket_mode: str,
    weight_col: str | None = None,
    fan_partitions: int | None = None,
) -> DataFrame:
    """Banding + candidate self-join + Jaccard refine over ``(id, toks,
    sig)``. ``weight_col`` (collapse path) weights the hot-bucket
    member counts so rep-level buckets are classified exactly as the
    uncollapsed member-level buckets would be.

    ``fan_partitions`` (optimization round 9, guide §2.5): repartition
    the exploded band rows by id before the candidate self-join. Set
    by plan-layer callers ONLY when the backing corpus is too small to
    fill the session's cores (``plans/fanout.py::fan_partitions``) —
    the bench corpus leaves the banding/candidate/pair-dedup pipeline
    on ONE task (1-block checkpointed artifact + AQE small-shuffle
    coalescing), and the inserted exchange doubles as the reuse point
    that stops the explode lineage re-evaluating once per consumer
    branch (bucket counts, normal, hot). At production scan sizes the
    caller passes None and the plan is unchanged — re-evaluating a
    cheap explode per branch beats shuffling the exploded corpus."""
    rows_per_band = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(F.lit(b), F.slice("sig", b * rows_per_band + 1, rows_per_band)).alias(
                    "bkey"
                ),
            )
            for b in range(bands)
        ]
    )
    # candidate generation is NARROW: only (id, band, bkey) flows through
    # the self-join and pair-dedup shuffles; the (wide) token/signature
    # arrays are re-attached afterwards by joining back to `base`.
    w = F.col(weight_col) if weight_col else F.lit(1)
    exploded = base.select(
        "id", w.alias("_w"), F.explode(band_structs).alias("bs")
    ).select("id", "_w", F.col("bs.band").alias("band"), F.col("bs.bkey").alias("bkey"))
    if fan_partitions:
        exploded = exploded.repartition(fan_partitions, "id")

    bucket_counts = exploded.groupBy("band", "bkey").agg(F.sum("_w").alias("bn"))
    hot_keys = bucket_counts.filter(F.col("bn") > max_bucket)
    normal = exploded.join(F.broadcast(hot_keys), ["band", "bkey"], "left_anti")

    def pair_up(side: DataFrame, keys: list[str]) -> DataFrame:
        a = side.withColumnRenamed("id", "id_a")
        b = side.withColumnRenamed("id", "id_b")
        return a.join(b, keys).filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")

    # normal buckets: lean direct self-join, no chunk machinery at all
    cand = pair_up(normal, ["band", "bkey"])

    if hot_bucket_mode == "chunk":
        # hot buckets: split each into ceil(m/max) chunks by id-hash; the
        # probe side replicates per chunk so the m²/2 pair generation
        # spreads over chunks tasks instead of one straggler
        hot = exploded.join(F.broadcast(hot_keys), ["band", "bkey"]).withColumn(
            "nchunks", F.ceil(F.col("bn") / max_bucket).cast("int")
        )
        h_a = hot.select(
            F.col("id").alias("id_a"),
            "band",
            "bkey",
            F.pmod(F.xxhash64("id"), F.col("nchunks")).cast("int").alias("chunk"),
        )
        h_b = hot.select(
            F.col("id").alias("id_b"),
            "band",
            "bkey",
            F.explode(F.sequence(F.lit(0), F.col("nchunks") - 1)).alias("chunk"),
        )
        hot_cand = (
            h_a.join(h_b, ["band", "bkey", "chunk"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cand = cand.unionByName(hot_cand)
    elif hot_bucket_mode != "drop":
        raise ValueError(f"unknown hot_bucket_mode {hot_bucket_mode!r}")

    # Pair-dedup is a deliberate narrow shuffle. The alternative —
    # emitting each pair only at its FIRST colliding band by carrying
    # every band key through the join and filtering earlier-band
    # matches — removes this exchange but measured 3.5× slower end-to-
    # end at sf0.1 (18 s → 65 s): the candidate join must then sort and
    # shuffle array-payload rows instead of (id, band, bkey) scalars,
    # which dwarfs the saved exchange. Candidates stay narrow; dedup
    # stays explicit.
    cand = cand.dropDuplicates(["id_a", "id_b"])

    if num_hashes > 32:
        # Memory control for the SCALED banding regimes (round 8 — the
        # sf10 rehearsal OOM'd the refine once signatures widened to 90
        # longs: each candidate row drags two ~720 B sigs + two ~1.6 KB
        # token arrays through a 32-partition sort-merge join). Two
        # levers, neither changing the qualifying pair set:
        # (a) an EXACT length-ratio prefilter on narrow (id, size) rows
        #     — J ≥ t requires |∩| ≥ t·|∪| ≥ t·max, and |∩| ≤ min, so
        #     min ≥ t·max; pairs failing it cannot pass the refine;
        # (b) payload-attach partitioning PINNED wide (the AQE fan-out
        #     blindspot: candidate rows are narrow pre-join, so AQE
        #     coalesces the exchange, but each output row is ~100× its
        #     input once payloads attach).
        cand = _pinned_wide(
            _length_ratio_prefilter(
                cand, base, "id", "id_a", "id_b", threshold
            ),
            "id_a",
        )

    if num_hashes > 64:
        # The ≥10⁶-doc decade regimes are SHUFFLE-BOUND, not
        # compute-bound (measured at sf10, 500 k docs, (90, 9)): with
        # the sig payload + est prefilter the refine needs 16 g heap
        # and runs 264 s; dropping the sig payload (est_jaccard emits
        # NULL — exact jaccard decides anyway) fits 8 g and runs 124 s.
        # At the 10⁵ decade ((63, 7), sf1) the trade flips — est's
        # pruning outweighs its carry cost (20 s vs 50 s) — so the lean
        # shape engages only past the 64-hash width.
        pay_a = base.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
        pay_b = base.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
        return (
            cand.join(pay_a, "id_a")
            .join(pay_b, "id_b")
            .withColumn("est_jaccard", F.lit(None).cast("double"))
            .withColumn(
                "jaccard", F.round(jaccard(F.col("toks_a"), F.col("toks_b")), 6)
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "est_jaccard", "jaccard")
        )

    pay_a = base.select(
        F.col("id").alias("id_a"), F.col("toks").alias("toks_a"), F.col("sig").alias("sig_a")
    )
    pay_b = base.select(
        F.col("id").alias("id_b"), F.col("toks").alias("toks_b"), F.col("sig").alias("sig_b")
    )
    joined = cand.join(pay_a, "id_a").join(pay_b, "id_b")

    # compare the first num_hashes entries: the seeded hash family has
    # the prefix property (seeds 0..k-1), so a persisted signature wider
    # than this banding's num_hashes serves it exactly — est must
    # compare the same prefix it divides by (shared array-compare
    # helper, see _est_jaccard — the unrolled scalar chain is the
    # pinned negative result its docstring rejects)
    est = _est_jaccard("sig_a", "sig_b", num_hashes)
    # cheap signature-based prefilter (16 long compares) before the exact
    # O(|toks|) intersect; the margin keeps sketch variance from dropping
    # true positives — final correctness comes from the exact filter.
    est_floor = max(threshold - 0.35, 0.0)
    return (
        joined.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= est_floor)
        .withColumn("jaccard", F.round(jaccard(F.col("toks_a"), F.col("toks_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard", "jaccard")
    )


def lsh_dedup_keepers(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    **lsh_kwargs,
) -> DataFrame:
    """Near-dup REMOVAL (not just pair listing): greedy lowest-id-wins.

    Every document appearing as the higher id of a ≥threshold pair is
    dropped; survivors are therefore pairwise non-duplicate at the
    threshold (any surviving pair (a,b), a<b would have had b dropped).
    This is the standard one-pass greedy used by large corpus-dedup
    pipelines — deterministic, no connected-components iteration.
    """
    pairs = minhash_lsh_pairs(df, id_col, text_col, threshold, **lsh_kwargs)
    doomed = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(doomed, id_col, "left_anti")


# ------------------------------------------------------------ SimHash

def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document: explode term frequencies, vote each
    bit ±weight, reassemble the sign vector into one long.

    One shuffle (groupBy id) with 64 narrow integer aggregates — Spark's
    partial aggregation keeps the exchange small.
    """
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn("h", F.xxhash64("tok"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, F.col("w")).otherwise(
                -F.col("w")
            )
        ).alias(f"v{i}")
        for i in range(64)
    ]
    voted = tf.groupBy("id").agg(*votes)
    # reassemble: bit 63 contributes Long.MIN_VALUE (2^63 overflows signed)
    sim = F.lit(0).cast("long")
    for i in range(63):
        sim = sim + F.when(
            F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    sim = sim + F.when(
        F.col("v63") > 0, F.lit(-(2**63)).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return voted.select("id", sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: 4×16-bit band buckets generate
    candidates; exact Hamming distance (bit_count of XOR) filters.
    With max_hamming ≤ 3, any matching pair shares at least one intact
    16-bit band (pigeonhole) — banding loses nothing."""
    sh = simhash64(df, id_col, text_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(k).alias("band"),
                F.shiftright("simhash", 16 * k).bitwiseAND(F.lit(0xFFFF)).alias("bkey"),
            )
            for k in range(4)
        ]
    )
    exploded = sh.select("id", "simhash", F.explode(bands).alias("bs")).select(
        "id", "simhash", F.col("bs.band").alias("band"), F.col("bs.bkey").alias("bkey")
    )
    a = exploded.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "bkey")
    b = exploded.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "bkey")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------- portable (oracle-able) MinHash

def _portable_minhash_sig(toks_col: str | Column, num_hashes: int) -> Column:
    """k md5-based min-hashes: h_seed(tok) = first 60 bits of
    md5('{seed}|{tok}') — reproducible by any engine with md5."""

    def _h(seed: int):
        prefix = F.lit(f"{seed}|")
        return lambda t: F.conv(
            F.substring(F.md5(F.concat(prefix, t)), 1, 15), 16, 10
        ).cast("bigint")

    return F.array(
        *[F.array_min(F.transform(toks_col, _h(s))) for s in range(num_hashes)]
    )


def _portable_band_structs(bands: int, rows_per_band: int) -> Column:
    """Band keys over a ``sig`` column: md5 of the comma-joined row of
    min-hashes — portable across engines (vs the fast variant's F.hash)."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("sig", b * rows_per_band + i + 1).cast(
                                "string"
                            )
                            for i in range(rows_per_band)
                        ],
                    )
                ).alias("bkey"),
            )
            for b in range(bands)
        ]
    )


def lsh_params_for(
    n_docs: int,
    threshold: float = 0.8,
    baseline_jaccard: float = 0.2,
    fp_budget_per_doc: float = 1.0,
    min_recall: float = 0.9,
) -> tuple[int, int]:
    """Size (num_hashes, bands) for a corpus — the production lever the
    round-7 sf10 rehearsal measured (SCALING.md: with the oracle-pinned
    (16, 4) the per-pair band-collision rate ≈ bands·J₀^r is CONSTANT,
    so candidates grow quadratically; at 5·10⁵ docs that was 476M
    candidate pairs and a disk-full refine, while r=8 completed
    end-to-end).

    For each rows-per-band r the band count is set so the banding
    S-curve's midpoint sits at the threshold (bands ≈ t^−r — the
    standard placement: pairs at J = t collide with probability ≈ 1−1/e,
    well above ½); the smallest r is chosen whose expected
    false-positive candidates per document — n_docs · bands · J₀^r,
    with J₀ the corpus's baseline Jaccard between unrelated documents —
    stays within ``fp_budget_per_doc`` while recall measured just above
    the threshold (at (1+t)/2) clears ``min_recall``. Returns
    (num_hashes = r·bands, bands).

    Honesty note on the returned regimes (ADVICE r7): because the band
    count follows the S-curve placement b ≈ t^−r, the helper returns
    r=8-class regimes like (48, 6) as the corpus grows — it can NEVER
    return the hand-pinned certification settings (16, 4) or (32, 4),
    whose b=4 sits off the t^−r curve (at t=0.8, r=8 ⇒ b≈6). Those
    pinned settings exist so the DuckDB oracles unroll a fixed banding;
    production/default paths route through this helper (or
    :func:`scaled_lsh_params`) instead. The ``min_recall`` default is
    0.9 — the t^−r placement yields ≈0.93–0.98 recall at (1+t)/2 for
    the r the FP budget picks; demanding 0.99 forces r≥13 at t=0.8 and
    triples the signature cost for recall the measured-good r=8/r=10
    regimes already approach.
    """
    if not 0 < threshold < 1 or not 0 <= baseline_jaccard < threshold:
        raise ValueError("need 0 <= baseline_jaccard < threshold < 1")
    recall_at = (1 + threshold) / 2
    for r in range(2, 65):
        b = max(1, round(threshold**-r))
        if b > 1024:  # signature width r·b beyond practical budget
            break
        recall = 1 - (1 - recall_at**r) ** b
        fp_per_doc = n_docs * b * baseline_jaccard**r
        if fp_per_doc <= fp_budget_per_doc and recall >= min_recall:
            return (r * b, b)
    raise ValueError(
        f"no (r, bands) with bands <= 1024 meets fp_budget="
        f"{fp_budget_per_doc} at n={n_docs}, J0={baseline_jaccard}, "
        f"t={threshold} — widen the budget or lower min_recall"
    )


def scaled_lsh_params(n_docs: int, threshold: float = 0.8) -> tuple[int, int]:
    """:func:`lsh_params_for` with the corpus count rounded UP to the
    next power of ten — the DEFAULT-path auto-sizing seam (VERDICT r7
    #1). Decade rounding makes the chosen (num_hashes, bands) a step
    function of corpus magnitude, so (a) ordinary ingest growth does not
    silently flip banding between runs, and (b) an oracle entry that
    pins the decade-derived parameters in its SQL stays hash-green
    under small row-count drift of the test corpus. Examples at t=0.8:
    ≤10³ docs → (15, 3); 10⁴ → (35, 5); 10⁵ → (63, 7)-class; 10⁶ →
    (90, 9)-class — candidates stay ≈ linear in n where fixed (16, 4)
    banding was measured FP-quadratic (SCALING.md)."""
    return lsh_params_for(_next_decade(n_docs), threshold=threshold)


def minhash_lsh_pairs_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    tokens: Column | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs with a PORTABLE hash family — md5-based
    min-hashes (h_seed(tok) = first 60 bits of md5('{seed}|{tok}')) and
    md5 band keys — so an independent engine computes bit-identical
    signatures, buckets, candidates and output. This is the
    differential-testing twin of :func:`minhash_lsh_pairs` (which keeps
    xxhash64 for the cheap inner loop and the hot-bucket machinery);
    banding parameters and the exact-Jaccard refine are the same.

    ``tokens`` overrides the shingling unit (default: distinct unigram
    tokens) — pass ``textops.shingles(text_col, w)`` for Broder
    w-shingle near-dup (round 8), any array<string> expression works.

    Output: (id_a, id_b, jaccard) for candidate pairs ≥ threshold.
    """
    r = num_hashes // bands
    tok_expr = distinct_tokens(text_col) if tokens is None else tokens
    base = df.select(
        F.col(id_col).alias("id"), tok_expr.alias("toks")
    ).withColumn("sig", _portable_minhash_sig("toks", num_hashes))

    exploded = base.select(
        "id", F.explode(_portable_band_structs(bands, r)).alias("bs")
    ).select(
        "id", F.col("bs.band").alias("band"), F.col("bs.bkey").alias("bkey")
    )
    a = exploded.withColumnRenamed("id", "id_a")
    b = exploded.withColumnRenamed("id", "id_b")
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    pay_a = base.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    pay_b = base.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    return (
        cand.join(pay_a, "id_a")
        .join(pay_b, "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("toks_a"), F.col("toks_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def portable_rep_pairs(
    groups: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """GROUP-level near-dup pairs for the portable family: banding +
    candidate join + rounded-Jaccard refine over one representative per
    distinct tokset. Returns (gkey_a, gkey_b, jaccard) — the contracted
    similarity graph that :func:`minhash_lsh_pairs_portable_grouped`
    expands to member pairs, and that group-level consumers (connected
    components over the GROUP graph — identical connectivity, edges
    smaller by the product of group sizes) consume directly."""
    r = num_hashes // bands
    exploded = groups.select(
        "gkey", F.explode(_portable_band_structs(bands, r)).alias("bs")
    ).select("gkey", F.col("bs.band").alias("band"), F.col("bs.bkey").alias("bkey"))
    a = exploded.withColumnRenamed("gkey", "gkey_a")
    b = exploded.withColumnRenamed("gkey", "gkey_b")
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("gkey_a") < F.col("gkey_b"))
        .select("gkey_a", "gkey_b")
        .dropDuplicates(["gkey_a", "gkey_b"])
    )
    # EXACT length-ratio prefilter on narrow (gkey, size) rows before
    # token payloads attach (round 8 — the sf10 refine OOM/spill
    # class): dropped pairs cannot qualify, so output (and the DuckDB
    # oracle) are unchanged. The payload join is then pinned wide at
    # the scaled regimes: candidates are narrow pre-join, so AQE
    # under-partitions the exchange while every output row carries two
    # full STRING token arrays.
    cand = _length_ratio_prefilter(
        cand, groups, "gkey", "gkey_a", "gkey_b", threshold
    )
    if num_hashes > 32:  # scaled regimes only — gate scale keeps 32 tasks
        cand = _pinned_wide(cand, "gkey_a")
    # The refine's Jaccard depends ONLY on set-intersection cardinality,
    # so the payload joins carry xxhash64-HASHED token arrays (8 B per
    # token) instead of the raw strings (round 9 — the sf10 refine of
    # the components twin dragged ~1.6 KB string arrays per side through
    # a 32-task sort-merge join and OOM'd the 8 GiB heap): distinct
    # strings hash to distinct longs up to the same ~2⁻⁶⁴ birthday odds
    # already accepted for the gkey, so |∩| and the rounded jaccard are
    # unchanged and the DuckDB twin (string list_intersect) still
    # hash-matches. The md5 SIGNATURE chain stays on raw strings — that
    # is the portable part an independent engine must reproduce.
    htoks = F.transform("toks", lambda t: F.xxhash64(t))
    pay_a = groups.select(F.col("gkey").alias("gkey_a"), htoks.alias("toks_a"))
    pay_b = groups.select(F.col("gkey").alias("gkey_b"), htoks.alias("toks_b"))
    return (
        cand.join(pay_a, "gkey_a")
        .join(pay_b, "gkey_b")
        .withColumn("jaccard", F.round(jaccard(F.col("toks_a"), F.col("toks_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("gkey_a", "gkey_b", "jaccard")
    )


def minhash_lsh_pairs_portable_grouped(
    members: DataFrame,
    groups: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Identical-tokset-collapsed twin of
    :func:`minhash_lsh_pairs_portable` (round 5 — the portable analog of
    :func:`minhash_lsh_pairs_grouped`): banding, candidate join and the
    exact-Jaccard refine run over ONE representative per distinct
    tokset, then group pairs expand to member pairs. Pair-for-pair
    output-equivalent (tests/test_dedup.py): identical toksets imply
    identical md5 signatures, so candidate structure and the rounded
    jaccard are unchanged; within-group pairs share every band bucket
    and carry jaccard exactly 1.0 = round(jaccard(t,t), 6); empty
    toksets are excluded from the within fast path (flat computes
    jaccard([],[]) = 0 < threshold).

    The big win over the fast family is bigger here: the md5 min-hash
    chain (num_hashes md5 calls per token) is the dominant cost of the
    portable path, and collapsing computes it once per DISTINCT tokset.
    ``groups`` must carry (gkey, toks, sig) with the PORTABLE signature
    (see plans/shared_cache.py::portable_grouped_corpus); persist it —
    it feeds several plan branches.
    """
    rep_pairs = portable_rep_pairs(groups, threshold, num_hashes, bands)
    m_a = members.select(F.col("gkey").alias("gkey_a"), F.col("id").alias("ma"))
    m_b = members.select(F.col("gkey").alias("gkey_b"), F.col("id").alias("mb"))
    cross = (
        rep_pairs.join(m_a, "gkey_a")
        .join(m_b, "gkey_b")
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
            "jaccard",
        )
    )
    nonempty = groups.filter(F.size("toks") > 0).select("gkey")
    within = (
        members.join(nonempty, "gkey", "left_semi")
        .select("gkey", F.col("id").alias("id_a"))
        .join(members.select("gkey", F.col("id").alias("id_b")), "gkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(1.0).alias("jaccard"))
    )
    return cross.unionByName(within)


def build_corpus_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    hash_family: str = "portable",
    num_hashes: int = 16,
) -> DataFrame:
    """The reusable dedup index of a corpus: (id, text, fp, toks, sig).

    This is the "precompute once" artifact of the steady-state ingest
    design: write it to parquet alongside the corpus and every future
    batch dedups against the INDEX (pass it as ``corpus_index`` to
    :func:`dedup_incremental_survivors`), skipping the signature
    recompute entirely — at 100 TB the index build is a one-off scan,
    not a per-batch cost. Plain columns only, so it round-trips through
    parquet unchanged. Size ``num_hashes`` with
    :func:`scaled_lsh_params` (corpus-magnitude banding, VERDICT r7 #1)
    — batches that dedup against the index must band with num_hashes ≤
    the index's signature width (prefix property)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        F.md5(F.col(text_col)).alias("fp"),
        distinct_tokens(text_col).alias("toks"),
    )
    if hash_family == "fast":
        return base.withColumn(
            "toks", F.array_distinct(F.transform("toks", lambda t: F.xxhash64(t)))
        ).withColumn("sig", minhash_signature(F.col("toks"), num_hashes))
    return base.withColumn("sig", _portable_minhash_sig("toks", num_hashes))


def dedup_incremental_survivors(
    new_df: DataFrame,
    corpus_df: DataFrame | None,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    broadcast_new: bool = True,
    hash_family: str = "portable",
    max_corpus_bucket: int | None = None,
    corpus_index: DataFrame | None = None,
) -> DataFrame:
    """Rows of ``new_df`` that survive dedup against an EXISTING corpus —
    the steady-state shape of a training-data pipeline, where each
    ingest batch is deduplicated against the accumulated corpus instead
    of re-running a corpus-wide self-join.

    Two gates, both corpus-vs-batch joins (the corpus NEVER self-joins):

    1. **Exact**: md5 content fingerprint, dropped if the corpus already
       contains it.
    2. **Near**: portable MinHash band buckets (same md5 hash family as
       :func:`minhash_lsh_pairs_portable`); batch docs sharing a band
       bucket with a corpus doc are verified with exact Jaccard and
       dropped at ≥ ``threshold``.

    Scale: the per-batch cost is O(batch × collision rate), independent
    of corpus size in compute (the corpus side streams through one
    (band, bkey) join — at 100 TB the corpus's narrow
    (id, band, bkey, toks) index would be precomputed once and reused
    every batch, which is this plan minus the corpus signature stage).
    With ``broadcast_new`` (default — ingest batches are small relative
    to the corpus) every join broadcasts the batch side, so the corpus
    is never shuffled at all: band match, fingerprint match, and the
    Jaccard refine are all map-side.

    ``hash_family``: "portable" (md5 — reproducible by the DuckDB
    oracle; ~10× costlier hashing) or "fast" (xxhash64 signatures over
    pre-hashed long tokens + ``F.hash`` band keys — the production
    path; same banding structure, engine-specific buckets so rows-only
    at the gate). Exact-duplicate drops are hash-family-independent
    (md5 fingerprint either way); only near-dup candidate RECALL varies
    with the family's bucketing.

    ``max_corpus_bucket`` (None = exact): drop corpus band buckets with
    more members than the cap before candidate generation — the
    boilerplate guard for dense corpora, where one hot bucket otherwise
    yields |bucket| candidates per colliding batch doc. Exact-duplicate
    drops are unaffected (gate 1 is fingerprint-based).

    ``corpus_index``: a prebuilt :func:`build_corpus_index` frame
    (possibly re-read from parquet) — the steady-state path that skips
    the per-batch corpus signature recompute. Exactly ONE of
    ``corpus_df`` / ``corpus_index`` must be given (passing both is
    ambiguous; passing neither would silently dedup the batch against
    nothing). Hash family and num_hashes must match the index build.

    Output: the surviving ``new_df`` rows (id, text).
    """
    if hash_family not in ("portable", "fast"):
        raise ValueError(f"hash_family must be 'portable'|'fast', got {hash_family!r}")
    if (corpus_df is None) == (corpus_index is None):
        raise ValueError(
            "provide exactly one of corpus_df (raw corpus, signatures built "
            "per call) or corpus_index (prebuilt build_corpus_index frame)"
        )
    r = num_hashes // bands

    def prep(df: DataFrame) -> DataFrame:
        return build_corpus_index(
            df, id_col, text_col, hash_family=hash_family, num_hashes=num_hashes
        )

    new_b = prep(new_df)
    corpus_b = corpus_index if corpus_index is not None else prep(corpus_df)
    if corpus_index is not None:
        # ADVICE r8: a prebuilt index narrower than this banding would
        # silently truncate band keys — fail loudly instead
        corpus_b = corpus_b.withColumn(
            "sig", _sig_width_guarded("sig", num_hashes)
        )

    if hash_family == "fast":
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.hash(
                        F.lit(b), F.slice("sig", b * r + 1, r)
                    ).cast("string").alias("bkey"),
                )
                for b in range(bands)
            ]
        )
    else:
        band_structs = _portable_band_structs(bands, r)

    def bucketed(base: DataFrame) -> DataFrame:
        return base.select(
            "id", F.explode(band_structs).alias("bs")
        ).select("id", F.col("bs.band").alias("band"), F.col("bs.bkey").alias("bkey"))

    maybe_b = F.broadcast if broadcast_new else (lambda d: d)

    # gate 1 — exact fingerprint present in the corpus
    exact_dropped = (
        corpus_b.select("fp").join(maybe_b(new_b.select("id", "fp")), "fp")
        .select("id")
    )

    # gate 2 — band-bucket candidates, exact-Jaccard verified
    corpus_buckets = bucketed(corpus_b)
    if max_corpus_bucket is not None:
        # boilerplate guard: corpus buckets over the cap generate
        # |bucket| candidates per colliding batch doc — drop them (their
        # members are near-dups of *everything*; standard practice, same
        # rationale as minhash_lsh_pairs' hot_bucket_mode="drop"). Hot
        # keys are few: the anti-join side broadcasts.
        hot = (
            corpus_buckets.groupBy("band", "bkey")
            .agg(F.count(F.lit(1)).alias("bn"))
            .filter(F.col("bn") > max_corpus_bucket)
            .select("band", "bkey")
        )
        corpus_buckets = corpus_buckets.join(F.broadcast(hot), ["band", "bkey"], "left_anti")
    cand = (
        corpus_buckets
        .withColumnRenamed("id", "corpus_id")
        .join(maybe_b(bucketed(new_b).withColumnRenamed("id", "new_id")), ["band", "bkey"])
        .select("new_id", "corpus_id")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    scored = cand.join(
        corpus_b.select(
            F.col("id").alias("corpus_id"),
            F.col("toks").alias("toks_c"),
            F.col("sig").alias("sig_c"),
        ),
        "corpus_id",
    ).join(
        maybe_b(
            new_b.select(
                F.col("id").alias("new_id"),
                F.col("toks").alias("toks_n"),
                F.col("sig").alias("sig_n"),
            )
        ),
        "new_id",
    )
    if hash_family == "fast":
        # signature prefilter (k long compares) before the O(|toks|)
        # exact intersect — same margin as minhash_lsh_pairs; the
        # portable path skips it so the oracle stays candidate-exact
        est = _est_jaccard("sig_n", "sig_c", num_hashes)
        scored = scored.filter(est >= max(threshold - 0.35, 0.0))
    near_dropped = scored.filter(
        jaccard(F.col("toks_n"), F.col("toks_c")) >= threshold
    ).select(F.col("new_id").alias("id"))

    # dropped ids are ⊆ batch ids — broadcast keeps the final anti-join
    # map-side too (otherwise a union forfeits the auto-broadcast)
    dropped = exact_dropped.unionByName(near_dropped).distinct()
    return new_b.join(maybe_b(dropped), "id", "left_anti").select("id", "text")


def incremental_survivors_grouped(
    new_docs: DataFrame,
    batch_groups: DataFrame,
    corpus_fps: DataFrame,
    corpus_groups: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Identical-tokset-collapsed twin of
    :func:`dedup_incremental_survivors` (fast hash family, no bucket
    cap): the near-dup doom decision depends only on a document's
    DISTINCT TOKEN SET, so it is made once per batch tokset group
    against once-per-corpus tokset group, then fanned back to members.
    Output-equivalent (verified in tests/test_dedup.py): a batch doc is
    doomed iff (a) its exact md5 fingerprint exists in the corpus —
    still per-document, fingerprints differ WITHIN a tokset group — or
    (b) some corpus doc's tokset has Jaccard ≥ threshold, which is a
    group-level fact. Same-gkey corpus groups (Jaccard exactly 1, every
    band bucket shared) doom directly by key; cross-group candidates
    come from the same band-bucket join + est prefilter + exact refine
    as the flat path, at group granularity.

    Inputs: ``new_docs`` (id, text, fp, gkey); ``batch_groups`` /
    ``corpus_groups`` from :func:`tokset_groups` bases (gkey, gn, toks,
    sig); ``corpus_fps`` (fp). Batch-side frames broadcast everywhere —
    the corpus is never shuffled, preserving the steady-state scale
    story (corpus-side frames are the persisted index artifacts).

    Both group frames are runtime-guarded against a persisted signature
    NARROWER than ``num_hashes`` (ADVICE r8 — ``F.slice`` would silently
    truncate band keys and degrade recall with no error; the constraint
    used to live only in ``build_corpus_index``'s docstring).
    """
    r = num_hashes // bands
    batch_groups = batch_groups.withColumn(
        "sig", _sig_width_guarded("sig", num_hashes)
    )
    corpus_groups = corpus_groups.withColumn(
        "sig", _sig_width_guarded("sig", num_hashes)
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(F.lit(b), F.slice("sig", b * r + 1, r))
                .cast("string")
                .alias("bkey"),
            )
            for b in range(bands)
        ]
    )

    def bucketed(groups: DataFrame) -> DataFrame:
        return groups.select("gkey", F.explode(band_structs).alias("bs")).select(
            "gkey", F.col("bs.band").alias("band"), F.col("bs.bkey").alias("bkey")
        )

    # gate 1 — exact fingerprint present in the corpus (per document)
    exact_dropped = corpus_fps.join(
        F.broadcast(new_docs.select("id", "fp")), "fp"
    ).select("id")

    # gate 2a — identical tokset present in the corpus (Jaccard 1).
    # ADVICE r4: empty toksets are excluded — the flat path computes
    # jaccard([],[]) = 0, below any threshold > 0, so an empty batch doc
    # must NOT be doomed by an empty corpus doc (it still dooms via the
    # exact-fp gate when texts are byte-identical).
    same_gkey = (
        corpus_groups.filter(F.size("toks") > 0)
        .join(F.broadcast(batch_groups.select("gkey")), "gkey", "left_semi")
        .select("gkey")
    )

    # gate 2b — cross-group band candidates, est-prefiltered, refined
    cand = (
        bucketed(corpus_groups)
        .withColumnRenamed("gkey", "gkey_c")
        .join(
            F.broadcast(bucketed(batch_groups).withColumnRenamed("gkey", "gkey_n")),
            ["band", "bkey"],
        )
        .filter(F.col("gkey_c") != F.col("gkey_n"))
        .select("gkey_n", "gkey_c")
        .dropDuplicates(["gkey_n", "gkey_c"])
    )
    scored = cand.join(
        corpus_groups.select(
            F.col("gkey").alias("gkey_c"),
            F.col("toks").alias("toks_c"),
            F.col("sig").alias("sig_c"),
        ),
        "gkey_c",
    ).join(
        F.broadcast(
            batch_groups.select(
                F.col("gkey").alias("gkey_n"),
                F.col("toks").alias("toks_n"),
                F.col("sig").alias("sig_n"),
            )
        ),
        "gkey_n",
    )
    est = _est_jaccard("sig_n", "sig_c", num_hashes)
    near_gkeys = (
        scored.filter(est >= max(threshold - 0.35, 0.0))
        .filter(jaccard(F.col("toks_n"), F.col("toks_c")) >= threshold)
        .select(F.col("gkey_n").alias("gkey"))
    )

    doomed_gkeys = same_gkey.unionByName(near_gkeys).distinct()
    near_dropped = new_docs.join(
        F.broadcast(doomed_gkeys), "gkey", "left_semi"
    ).select("id")
    dropped = exact_dropped.unionByName(near_dropped).distinct()
    return new_docs.join(F.broadcast(dropped), "id", "left_anti").select("id", "text")


def simhash_portable(text_col: str | Column) -> Column:
    """60-bit SimHash as a pure Column expression with a PORTABLE hash
    (first 60 bits of md5(token), unweighted distinct tokens) — an
    independent engine reproduces it bit-for-bit. 60 bits keeps every
    intermediate positive in a signed 64-bit long (no sign-bit special
    case); the vote per bit is a strict majority (ties → 0)."""
    hs = F.transform(
        distinct_tokens(text_col),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint"),
    )
    n = F.size(hs)

    # one-parameter lambda via factory — a `lambda x, j=j` would be
    # bound by pyspark as (element, index), silently shadowing j
    def _bit_set(j: int):
        return lambda x: F.shiftright(x, j).bitwiseAND(F.lit(1)) == 1

    sh = F.lit(0).cast("long")
    for j in range(60):
        ones = F.size(F.filter(hs, _bit_set(j)))
        sh = sh + F.when(
            ones * 2 > n, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
    return sh


def simhash_near_pairs_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with the portable 60-bit fingerprint:
    4×15-bit band buckets generate candidates (pigeonhole-complete at
    hamming ≤ 3), exact Hamming (bit_count of XOR) filters. The DuckDB
    twin reproduces fingerprints, buckets and distances exactly."""
    sh = df.select(
        F.col(id_col).alias("id"), simhash_portable(text_col).alias("simhash")
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(k).alias("band"),
                F.shiftright("simhash", 15 * k)
                .bitwiseAND(F.lit(0x7FFF))
                .alias("bkey"),
            )
            for k in range(4)
        ]
    )
    exploded = sh.select("id", "simhash", F.explode(bands).alias("bs")).select(
        "id", "simhash", F.col("bs.band").alias("band"), F.col("bs.bkey").alias("bkey")
    )
    a = exploded.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "bkey"
    )
    b = exploded.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "bkey"
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
