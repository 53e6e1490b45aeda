"""Exact set-similarity join via prefix filtering, and positional
phrase search — round 5, session 3.

``prefix_filter_jaccard_pairs`` is the EXACT complement to the MinHash
LSH family (``operators/dedup.py``): LSH trades recall for speed;
prefix filtering (Chaudhuri et al. ICDE'06 / PPJoin, Xiao et al.
WWW'08) returns the complete answer set with no false negatives by
exploiting a threshold-derived candidate bound — two sets with
Jaccard ≥ τ MUST share a token inside each other's rarest-(|t| −
⌈τ|t|⌉ + 1)-token prefix. At 100 TB this is the production shape for
"find ALL pairs above τ" audits (e.g. certifying an LSH run's recall,
see ``lsh_recall_eval``).

``phrase_search_docs`` is the positional-inverted-index primitive:
token positions survive the explode, so n-gram phrase matching is
adjacency arithmetic instead of substring scans.

Reference parity note: the reference (src/main.py:1-141) has no text
surface; these extend the training-data-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table

# Jaccard threshold τ = 9/10 kept as an integer ratio so both the
# prefix length and the verification predicate run in pure integer
# arithmetic (no float-rounding seam at the gate).
_TAU_NUM = 9
_TAU_DEN = 10
# Sample modulus: pair output is inherently quadratic in cluster sizes,
# so the entry audits a deterministic 1-in-3 slice. Production knob:
# pick the modulus so the sampled corpus is a fixed absolute size
# (same contract as lsh_recall_eval).
_PF_MOD = 3


def prefix_filter_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL document pairs with token-set Jaccard ≥ 0.9 (exact, no false
    negatives) on a deterministic 1-in-3 doc sample, via prefix
    filtering.

    Plan: tokenize → global token document-frequency (a vocab-sized
    dim, broadcast) → order each doc's tokens rarest-first by
    (df, token) — no global rank window needed, the (df, token) tuple
    IS the order — keep only the first |t| − ⌈τ·|t|⌉ + 1 tokens (the
    prefix), self-join on prefix token UNDER the PPJoin size and
    positional filters (see inline comment — both exactness-preserving,
    both pure integer), then verify candidates with the EXACT integer
    predicate 10·|a∩b| ≥ 9·|a∪b|. ⌈9s/10⌉ is computed as (9s+9) DIV 10
    — integer in both engines. The positional filter is what survives
    this corpus's adversarial 31-token vocabulary: every token bucket
    is huge (no token is rare), so position-bounded overlap is the only
    effective pre-verification cut.

    The oracle generates candidates from ANY shared token (a strict
    superset of prefix candidates) and applies the same exact
    verification — equality of outputs is exactly the prefix-filter
    correctness theorem, so the driver hash-checks the theorem itself.

    Scale: candidate volume is bounded by prefix-token collisions
    (rarest tokens first ⇒ smallest buckets); the verification join
    carries the token arrays, never re-exploding the corpus. Empty
    token sets are excluded up front (ADVICE r4: Jaccard on ∅ is 0 by
    contract, never 1).
    """
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _PF_MOD == 0)
        .select(
            "doc_id",
            F.array_sort(
                F.array_distinct(F.split("text", " "))
            ).alias("toks"),
        )
        .filter(F.size("toks") > 0)
    )
    e = d.select("doc_id", F.explode("toks").alias("tok"))
    dfreq = e.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    by_rarity = (
        e.join(F.broadcast(dfreq), "tok")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("df"), F.col("tok")))
            ).alias("ordered")
        )
    )
    pref_len = F.expr(
        "CAST(size(ordered) - (({n} * size(ordered) + {n}) DIV {d}) + 1"
        " AS INT)".format(n=_TAU_NUM, d=_TAU_DEN)
    )
    pref = by_rarity.select(
        "doc_id",
        F.size("ordered").alias("s"),
        F.posexplode(
            F.slice(F.transform("ordered", lambda x: x["tok"]), 1, pref_len)
        ).alias("i0", "tok"),
    ).select(
        "doc_id", "s", (F.col("i0") + 1).alias("i"), "tok"
    )
    # PPJoin candidate pruning, both exactness-preserving theorems:
    # - size filter: J(a,b) ≥ 9/10 ⇒ 9·|a| ≤ 10·|b| and 9·|b| ≤ 10·|a|
    # - positional filter: if the first shared token sits at rarity
    #   position i in a and j in b, the overlap is ≤ min(|a|−i,|b|−j)+1,
    #   which must reach the overlap threshold α = ⌈(τ/(1+τ))(|a|+|b|)⌉
    #   = (9(|a|+|b|)+18) DIV 19. Integer arithmetic throughout — no
    #   float seam, and a qualifying pair always survives via its FIRST
    #   shared token (both conditions hold there), so no false negatives.
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.lit(_TAU_NUM) * F.col("a.s") <= F.lit(_TAU_DEN) * F.col("b.s"))
            & (F.lit(_TAU_NUM) * F.col("b.s") <= F.lit(_TAU_DEN) * F.col("a.s"))
            & (
                F.least(
                    F.col("a.s") - F.col("a.i"), F.col("b.s") - F.col("b.i")
                )
                + 1
                >= F.expr(
                    "CAST(({n} * (a.s + b.s) + {c}) DIV {d} AS INT)".format(
                        n=_TAU_NUM,
                        c=_TAU_NUM + _TAU_DEN - 1,
                        d=_TAU_NUM + _TAU_DEN,
                    )
                )
            ),
        )
        .select(
            F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst")
        )
        .distinct()
    )
    da = d.select(F.col("doc_id").alias("src"), F.col("toks").alias("ta"))
    db = d.select(F.col("doc_id").alias("dst"), F.col("toks").alias("tb"))
    v = (
        cand.join(da, "src")
        .join(db, "dst")
        .select(
            "src",
            "dst",
            F.size(F.array_intersect("ta", "tb"))
            .cast("bigint")
            .alias("i_size"),
            (F.size("ta") + F.size("tb"))
            .cast("bigint")
            .alias("__sz"),
        )
        .withColumn("u_size", F.col("__sz") - F.col("i_size"))
        .filter(
            F.lit(_TAU_DEN) * F.col("i_size")
            >= F.lit(_TAU_NUM) * F.col("u_size")
        )
    )
    return v.select(
        "src",
        "dst",
        "i_size",
        "u_size",
        F.round(
            F.col("i_size").cast("double") / F.col("u_size").cast("double"), 6
        ).alias("jaccard"),
    )


PREFIX_FILTER_SQL = f"""
WITH d AS (
  SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS toks
  FROM documents
  WHERE doc_id % {_PF_MOD} = 0
    AND len(list_distinct(string_split(text, ' '))) > 0
), e AS (
  SELECT doc_id, unnest(toks) AS tok FROM d
), cand AS (
  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
  FROM e a JOIN e b ON a.tok = b.tok AND a.doc_id < b.doc_id
), v AS (
  SELECT src, dst,
         len(list_intersect(da.toks, db.toks))::BIGINT AS i_size,
         (len(da.toks) + len(db.toks)
          - len(list_intersect(da.toks, db.toks)))::BIGINT AS u_size
  FROM cand
  JOIN d da ON da.doc_id = src
  JOIN d db ON db.doc_id = dst
)
SELECT src, dst, i_size, u_size,
       ROUND(i_size::DOUBLE / u_size::DOUBLE, 6) AS jaccard
FROM v
WHERE {_TAU_DEN} * i_size >= {_TAU_NUM} * u_size
"""


def phrase_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occurrences per document of the corpus's most frequent trigram
    phrase — the positional-inverted-index primitive.

    The position column from ``posexplode`` makes phrase matching
    adjacency arithmetic: the trigram at position p is
    (tok[p], tok[p+1], tok[p+2]). Here trigrams are formed with two
    ``lead`` windows over the (doc, pos) order — ONE exchange, already
    partitioned by doc — the top phrase is a global count + top-1
    (count DESC, phrase ASC tie-break, both engines), and per-doc
    occurrence counts come from one broadcast-filtered aggregation.
    Overlapping occurrences count (both engines, by construction).

    Scale: the trigram frame is ~|corpus tokens| rows wide and never
    self-joins; at query-serving scale the same frame IS the positional
    index — persist it bucketed by token and phrase lookup becomes two
    co-located joins on (doc, pos+k) with no scan of the raw text.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    tri = (
        t.withColumn("t1", F.lead("tok", 1).over(w))
        .withColumn("t2", F.lead("tok", 2).over(w))
        .filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.concat_ws(" ", "tok", "t1", "t2").alias("phrase"),
        )
    )
    top = (
        tri.groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("phrase").asc())
        .limit(1)
        .select("phrase")
    )
    return (
        tri.join(F.broadcast(top), "phrase")
        .groupBy("doc_id", "phrase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.min("pos").cast("bigint").alias("first_pos"),
        )
        .select("doc_id", "phrase", "n_occurrences", "first_pos")
    )


PHRASE_SEARCH_SQL = """
WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), t AS (
  SELECT doc_id, unnest(l) AS tok, unnest(range(0, len(l))) AS pos FROM s
), g AS (
  SELECT a.doc_id, a.pos, a.tok || ' ' || b.tok || ' ' || c.tok AS phrase
  FROM t a
  JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN t c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
), top AS (
  SELECT phrase FROM (
    SELECT phrase, COUNT(*) AS c FROM g GROUP BY 1
  ) ORDER BY c DESC, phrase ASC LIMIT 1
)
SELECT g.doc_id, g.phrase, COUNT(*)::BIGINT AS n_occurrences,
       MIN(g.pos)::BIGINT AS first_pos
FROM g JOIN top ON g.phrase = top.phrase
GROUP BY 1, 2
"""


def register_entries(register) -> None:  # noqa: ANN001 — see catalog.register
    register(
        "prefix_filter_jaccard_pairs",
        prefix_filter_jaccard_pairs,
        PREFIX_FILTER_SQL,
    )
    register("phrase_search_docs", phrase_search_docs, PHRASE_SEARCH_SQL)
