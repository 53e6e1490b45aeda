"""Duplicated-passage (exact substring dedup) catalog entries
(operators/spandedup.py) — span report, per-doc exposure stats, and
keep-first passage stripping, each with a DuckDB oracle twin.

Both engines build the same k-token window table (full-md5 keys over a
single-space split), mark duplicates with the same two window functions
over ``PARTITION BY h``, merge islands with the same running-max rule,
and break every tie on total ``(doc_id, pos)`` order — so all three
entries hash-certify.

Reference scope note: the reference (src/main.py:1-141) has no dedup
stage; this family is part of the mandated LLM-pipeline extension
surface (doc-level dedup lives in operators/dedup.py — this is the
finer, Lee-et-al.-2022 passage granularity those operators cannot see).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import spandedup
from ..sources.registry import load_table
from .fanout import fan_out

#: window width in tokens (see operators/spandedup.py::K_TOKENS).
K = spandedup.K_TOKENS


def _spans(spark: SparkSession, sf_dir: str, keep_first: bool) -> DataFrame:
    # the k-token window build (per-window md5 over every slice — the
    # family's dominant map-side cost) runs on however many tasks the
    # scan yields; a one-row-group parquet file yields ONE, so fan the
    # (doc_id, text) projection out first (guide §2.5 input skew; no-op
    # at production scan sizes, and window hashing is per-row, so the
    # result is partitioning-independent)
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        sf_dir,
        "documents",
        key="doc_id",
    )
    w = spandedup.window_hashes(docs, "text", "doc_id", K)
    dup = spandedup.duplicated_windows(w, "doc_id", keep_first=keep_first)
    return spandedup.merge_spans(dup, "doc_id", K)


def dup_passage_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-passage spans per document (ALL occurrences —
    the exposure view). Token-scale window table → ONE hash exchange
    (count + keep-first rank in the same Window node) → ONE doc
    exchange for the island merge; see operators/spandedup.py for the
    100 TB shape. The ORDER BY is presentational."""
    return _spans(spark, sf_dir, keep_first=False).orderBy(
        "doc_id", "span_start"
    )


def dup_passage_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-token exposure (n_tokens, dup_tokens,
    dup_frac) — every doc reports, zero-exposure docs included, so the
    result is a full-corpus audit surface."""
    docs = load_table(spark, sf_dir, "documents")
    spans = _spans(spark, sf_dir, keep_first=False)
    return spandedup.doc_dup_stats(docs, spans, "text", "doc_id").orderBy(
        "doc_id"
    )


def corpus_strip_duplicate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first passage removal: each duplicated window's canonical
    occurrence (min (doc_id, pos)) survives; every other merged span is
    stripped from its document. Returns per-doc before/after token
    counts and the md5 of the surviving text — the corpus itself is
    scanned once and never exploded (array-filter drop, spans join back
    duplicate-scale)."""
    docs = load_table(spark, sf_dir, "documents")
    spans = _spans(spark, sf_dir, keep_first=True)
    return spandedup.strip_spans(docs, spans, "text", "doc_id").orderBy(
        "doc_id"
    )


def passage_strip_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-batch passage dedup against the accumulated corpus: every
    5th document plays the new batch (the dedup_incremental split), the
    rest the persisted window index. Batch windows already present in
    the corpus strip unconditionally (corpus seniority); within-batch
    repeats strip keep-first. The corpus index never shuffles — the
    batch's distinct hashes broadcast into a map-side semi-join
    (operators/spandedup.py::batch_removable_windows)."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    bw = spandedup.window_hashes(batch, "text", "doc_id", K)
    cw = spandedup.window_hashes(corpus, "text", "doc_id", K)
    rem = spandedup.batch_removable_windows(bw, cw, "doc_id")
    spans = spandedup.merge_spans(rem, "doc_id", K)
    return spandedup.strip_spans(batch, spans, "text", "doc_id").orderBy(
        "doc_id"
    )


#: shared oracle head: split → k-token window table with full-md5 keys
#: → occurrence count + keep-first rank over PARTITION BY h.
#: (range() is upper-exclusive: positions 1..n-k+1 need range(1, n-k+2).)
_W_CTE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
w0 AS (
  SELECT doc_id,
         unnest([{{'pos': i,
                   'h': md5(array_to_string(ts[i:i+{K - 1}], ' '))}}
                 for i in range(1, greatest(len(ts) - {K - 2}, 1))]) AS u
  FROM t
),
w AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM w0),
r AS (
  SELECT doc_id, pos,
         COUNT(*) OVER (PARTITION BY h) AS n_occ,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
  FROM w
)
"""

#: gaps-and-islands span merge over a duplicated-window set named ``d``.
_ISLANDS = f"""
g AS (
  SELECT doc_id, pos,
         MAX(pos + {K - 1}) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM d
),
isl AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM g
),
s AS (
  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {K - 1} AS span_end,
         MAX(pos) + {K - 1} - MIN(pos) + 1 AS span_tokens
  FROM isl GROUP BY doc_id, island
)
"""

DUP_SPANS_SQL = f"""{_W_CTE},
d AS (SELECT doc_id, pos FROM r WHERE n_occ >= 2),
{_ISLANDS}
SELECT doc_id, span_start, span_end, span_tokens
FROM s ORDER BY doc_id, span_start
"""

DUP_DOC_STATS_SQL = f"""{_W_CTE},
d AS (SELECT doc_id, pos FROM r WHERE n_occ >= 2),
{_ISLANDS},
per_doc AS (SELECT doc_id, SUM(span_tokens) AS dup_tokens FROM s GROUP BY doc_id)
SELECT t.doc_id, len(t.ts) AS n_tokens,
       COALESCE(per_doc.dup_tokens, 0)::BIGINT AS dup_tokens,
       ROUND(COALESCE(per_doc.dup_tokens, 0) * 1.0 / len(t.ts), 6) AS dup_frac
FROM t LEFT JOIN per_doc USING (doc_id)
ORDER BY t.doc_id
"""

STRIP_PASSAGES_SQL = f"""{_W_CTE},
d AS (SELECT doc_id, pos FROM r WHERE n_occ >= 2 AND rn >= 2),
{_ISLANDS},
tokpos AS (
  SELECT doc_id,
         unnest([{{'tok': ts[i], 'p': i}}
                 for i in range(1, len(ts) + 1)]) AS u
  FROM t
),
kept AS (
  SELECT tp.doc_id, (tp.u).tok AS tok, (tp.u).p AS p
  FROM tokpos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM s
    WHERE s.doc_id = tp.doc_id
      AND (tp.u).p BETWEEN s.span_start AND s.span_end)
),
clean AS (
  SELECT doc_id, COUNT(*) AS tok_after,
         md5(string_agg(tok, ' ' ORDER BY p)) AS clean_sig
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, len(t.ts) AS tok_before,
       COALESCE(clean.tok_after, 0)::BIGINT AS tok_after,
       COALESCE(clean.clean_sig, md5('')) AS clean_sig
FROM t LEFT JOIN clean USING (doc_id)
ORDER BY t.doc_id
"""


STRIP_INCREMENTAL_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
  WHERE doc_id % 5 = 0
),
tc AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
  WHERE doc_id % 5 <> 0
),
w0 AS (
  SELECT doc_id,
         unnest([{{'pos': i,
                   'h': md5(array_to_string(ts[i:i+{K - 1}], ' '))}}
                 for i in range(1, greatest(len(ts) - {K - 2}, 1))]) AS u
  FROM t
),
w AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM w0),
cw0 AS (
  SELECT unnest([md5(array_to_string(ts[i:i+{K - 1}], ' '))
                 for i in range(1, greatest(len(ts) - {K - 2}, 1))]) AS h
  FROM tc
),
corpus_h AS (SELECT DISTINCT h FROM cw0),
r AS (
  SELECT doc_id, pos, h,
         COUNT(*) OVER (PARTITION BY h) AS n_occ,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
  FROM w
),
d AS (
  SELECT doc_id, pos FROM r
  WHERE h IN (SELECT h FROM corpus_h) OR (n_occ >= 2 AND rn >= 2)
),
{_ISLANDS},
tokpos AS (
  SELECT doc_id,
         unnest([{{'tok': ts[i], 'p': i}}
                 for i in range(1, len(ts) + 1)]) AS u
  FROM t
),
kept AS (
  SELECT tp.doc_id, (tp.u).tok AS tok, (tp.u).p AS p
  FROM tokpos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM s
    WHERE s.doc_id = tp.doc_id
      AND (tp.u).p BETWEEN s.span_start AND s.span_end)
),
clean AS (
  SELECT doc_id, COUNT(*) AS tok_after,
         md5(string_agg(tok, ' ' ORDER BY p)) AS clean_sig
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, len(t.ts) AS tok_before,
       COALESCE(clean.tok_after, 0)::BIGINT AS tok_after,
       COALESCE(clean.clean_sig, md5('')) AS clean_sig
FROM t LEFT JOIN clean USING (doc_id)
ORDER BY t.doc_id
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("dup_passage_spans", dup_passage_spans, DUP_SPANS_SQL, headline=True)
    register(
        "passage_strip_incremental",
        passage_strip_incremental,
        STRIP_INCREMENTAL_SQL,
    )
    register("dup_passage_doc_stats", dup_passage_doc_stats, DUP_DOC_STATS_SQL)
    register(
        "corpus_strip_duplicate_passages",
        corpus_strip_duplicate_passages,
        STRIP_PASSAGES_SQL,
    )
