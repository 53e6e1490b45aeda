"""Cross-document duplicated-passage detection and removal (exact
substring dedup at token-window granularity), Spark-first.

The method (Lee et al., "Deduplicating Training Data Makes Language
Models Better", ACL 2022 — public) removes VERBATIM passages that
recur across a training corpus, which doc-level dedup (MinHash /
SimHash / semantic — operators/dedup.py) cannot see: two mostly
distinct documents sharing one boilerplate paragraph survive every
doc-level filter, yet the shared paragraph is exactly the memorization
hazard. Lee et al. build a suffix array; a suffix array is a
single-machine index, so the Spark-first shape is hashed k-token
windows instead:

1. slide a k-token window over every document (positions are 1-based;
   docs shorter than k contribute nothing);
2. a window occurring ≥ 2 times corpus-wide (within OR across docs) is
   a duplicated window; its occurrence with the smallest
   ``(doc_id, pos)`` is the CANONICAL one that keep-first retains;
3. per document, overlapping-or-adjacent duplicated windows merge into
   maximal duplicated spans (gaps-and-islands over a running max of
   span ends);
4. stripping removes the tokens of every NON-canonical duplicated
   window's merged span, so exactly one copy of each duplicated
   passage survives corpus-wide.

Scale shape (the 100 TB story):

- The window table is token-scale (≈ corpus tokens), but it is NARROW
  — ``(doc_id, pos, 128-bit hash)`` — and flows through exactly TWO
  exchanges: one hash-partitioned pass that computes occurrence count
  and keep-first rank TOGETHER (both are window functions over the
  same ``PARTITION BY h``, ONE shuffle, no groupBy + self-join
  double-scan), then one doc-partitioned pass for the island merge.
  Everything after the duplicate filter is duplicate-scale, not
  corpus-scale.
- Stripping never explodes the corpus: merged spans aggregate to one
  small array per affected doc, join back on ``doc_id`` (duplicate-
  scale side), and the token drop is a codegen'd array ``filter``
  lambda over the already-loaded token array — zero Python UDFs.
- Skew: a viral boilerplate window lands all its occurrences in one
  hash partition. AQE's skew handling does not split window-function
  partitions, so for pathological corpora cap the per-window
  occurrence list upstream (the hot-bucket-cap pattern of
  operators/dedup.py) — the report entries here keep totals exact and
  document the cap seam instead of silently sampling.
- Collision honesty: the window key is the FULL 128-bit md5 hex (not
  the repo's 60-bit portable prefix) — at 10^12 windows the birthday
  bound on 2^60 is not acceptable for an EXACT-match operator, and
  md5 hex is bit-identical in DuckDB so portability costs nothing.

Determinism / oracle parity: tokenization is a single-space split (the
corpus contract shared with operators/dsir.py), window text is
``concat_ws(' ', slice(tokens, i, k))``, and every tie-break is total
(``(doc_id, pos)``), so all three catalog entries hash-certify against
DuckDB twins (plans/passage_queries.py).

Reference scope note: the reference pipeline (src/main.py:1-141) has no
dedup stage at all; this module is part of the mandated LLM-training-
data extension surface (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default window width in tokens. Lee et al. use 50 BPE tokens on
#: web-scale documents; the synthetic corpus averages ~54 tokens per
#: doc, so 8 is the proportionate choice. The plan shape is
#: k-independent.
K_TOKENS = 8


def window_hashes(
    docs: DataFrame, text_col: str, id_col: str, k: int = K_TOKENS
) -> DataFrame:
    """Token-scale window table ``(id, pos, h)`` — one row per k-token
    window, ``h`` the full md5 hex of the window text.

    The per-doc window list is built as a codegen'd array ``transform``
    over ``sequence(1, n-k+1)`` and exploded once; ``sequence(1, m)``
    DESCENDS for m < 1 (same hazard as textops.shingles), so short docs
    are guarded to the empty array rather than yielding phantom
    reversed positions.
    """
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n = F.size(toks)
    wins = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(F.concat_ws(" ", F.slice(toks, i, k))).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,h:string>>"))
    return docs.select(
        F.col(id_col), F.explode(wins).alias("w")
    ).select(id_col, F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))


def duplicated_windows(
    windows: DataFrame, id_col: str, keep_first: bool = False
) -> DataFrame:
    """Filter the window table down to duplicated occurrences.

    ONE hash-partitioned exchange computes both the corpus-wide
    occurrence count and the keep-first rank (two window functions over
    the same ``PARTITION BY h`` — Spark plans them in a single Window
    node after a single shuffle). With ``keep_first=True`` the
    canonical occurrence (rank 1 by ``(id, pos)``) is EXCLUDED, i.e.
    the result is the set of removable occurrences.
    """
    by_hash = Window.partitionBy("h")
    ranked = windows.withColumn(
        "n_occ", F.count(F.lit(1)).over(by_hash)
    ).withColumn(
        "rn",
        F.row_number().over(by_hash.orderBy(F.col(id_col), F.col("pos"))),
    )
    dup = ranked.filter(F.col("n_occ") >= 2)
    if keep_first:
        dup = dup.filter(F.col("rn") >= 2)
    return dup.drop("n_occ", "rn")


def batch_removable_windows(
    batch_w: DataFrame, corpus_w: DataFrame, id_col: str
) -> DataFrame:
    """Removable windows of an ingest BATCH against a persisted corpus
    window index — the steady-state shape of a growing corpus, where
    each batch is passage-deduped against everything already ingested
    WITHOUT rescanning it (the analog of
    dedup.py::dedup_incremental_survivors at passage granularity).

    A batch window is removable when (a) its hash exists anywhere in
    the corpus index — the corpus copy is canonical by seniority — or
    (b) it repeats WITHIN the batch and is not the batch's first
    occurrence (keep-first on ``(id, pos)``).

    Scale: the corpus index never shuffles — the batch's distinct
    hashes BROADCAST into a map-side semi-join over the index, whose
    output is batch-bounded (≤ one row per distinct batch hash); the
    within-batch rank is a window over the batch only. Per-batch cost
    is O(batch + corpus scan), with the corpus scan pruned further by
    parquet min/max on ``h`` when the index is written sorted — at
    100 TB the index is the parquet artifact beside the corpus, and
    appending the batch's own windows to it keeps the invariant for
    the next batch.
    """
    matched = (
        corpus_w.select("h")
        .join(F.broadcast(batch_w.select("h").distinct()), "h")
        .distinct()
        .withColumn("in_corpus", F.lit(True))
    )
    by_hash = Window.partitionBy("h")
    ranked = batch_w.withColumn(
        "n_occ", F.count(F.lit(1)).over(by_hash)
    ).withColumn(
        "rn",
        F.row_number().over(by_hash.orderBy(F.col(id_col), F.col("pos"))),
    )
    removable = ranked.join(F.broadcast(matched), "h", "left").filter(
        F.col("in_corpus").isNotNull()
        | ((F.col("n_occ") >= 2) & (F.col("rn") >= 2))
    )
    return removable.select(id_col, "pos")


def merge_spans(
    dup_windows: DataFrame, id_col: str, k: int = K_TOKENS
) -> DataFrame:
    """Merge overlapping-or-adjacent duplicated windows into maximal
    spans — gaps-and-islands: per doc, a window at ``pos`` covers
    ``[pos, pos+k-1]``; a new island starts when ``pos`` exceeds the
    running max of prior ends + 1 (so touching spans fuse into one
    contiguous duplicated region). Returns
    ``(id, span_start, span_end, span_tokens)``. Duplicate-scale input,
    one doc-partitioned exchange.
    """
    by_doc = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(k - 1)).over(
        by_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup_windows.withColumn(
        "newi",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("newi").over(by_doc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return flagged.groupBy(id_col, "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        (F.max("pos") + F.lit(k - 1) - F.min("pos") + 1).alias("span_tokens"),
    ).drop("island")


def strip_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str,
    id_col: str,
    emit_text: bool = False,
) -> DataFrame:
    """Remove the tokens of every span from each document's text —
    ``(id, tok_before, tok_after, clean_sig)`` where ``clean_sig`` is
    the md5 of the space-rejoined surviving tokens ('' when a doc is
    stripped bare, md5-consistent across engines). With
    ``emit_text=True`` the surviving text itself is returned as
    ``text_clean`` instead of its md5 (the front-door shape — catalog
    entries keep the hash so the oracle compare stays narrow).

    The spans aggregate to ONE array per affected doc (duplicate-scale)
    and join back on the doc key; the drop itself is an array
    ``filter`` with a positional lambda (1-based to match the span
    coordinates) — the corpus is scanned once and never exploded.
    """
    spans_per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    keep = F.filter(
        toks,
        lambda t, i: ~F.coalesce(
            F.exists(
                F.col("spans"),
                lambda sp: (i + 1 >= sp["span_start"]) & (i + 1 <= sp["span_end"]),
            ),
            F.lit(False),
        ),
    )
    tail = (
        F.concat_ws(" ", keep).alias("text_clean")
        if emit_text
        else F.md5(F.concat_ws(" ", keep)).alias("clean_sig")
    )
    return docs.join(spans_per_doc, id_col, "left").select(
        F.col(id_col),
        F.size(toks).alias("tok_before"),
        F.size(keep).alias("tok_after"),
        tail,
    )


def doc_dup_stats(
    docs: DataFrame, spans: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Per-document duplicated-passage exposure:
    ``(id, n_tokens, dup_tokens, dup_frac)`` over ALL duplicated spans
    (canonical occurrences included — this measures exposure, not
    removal). Docs with no duplicated span report 0 / 0.0; merged spans
    never overlap (that is what the island merge guarantees), so the
    per-doc sum is exact.
    """
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_tokens").alias("dup_tokens")
    )
    n_tokens = F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
    return docs.join(per_doc, id_col, "left").select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)) / n_tokens, 6
        ).alias("dup_frac"),
    )
