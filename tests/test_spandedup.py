"""Duplicated-passage dedup tests (operators/spandedup.py +
plans/passage_queries.py).

The catalog entries hash-certify the computation against DuckDB; these
tests pin the SEMANTICS on hand-built corpora where the right answer is
known by construction: shared passages are found exactly, islands merge
correctly (overlap, adjacency, gaps), keep-first leaves exactly one
corpus-wide copy, and short/empty documents are inert.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpv_etl_code_spark.operators import spandedup

K = 4  # small window for hand-checkable fixtures


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _spans(docs, keep_first=False, k=K):
    w = spandedup.window_hashes(docs, "text", "doc_id", k)
    dup = spandedup.duplicated_windows(w, "doc_id", keep_first=keep_first)
    return spandedup.merge_spans(dup, "doc_id", k)


@pytest.fixture(scope="module")
def shared_passage(spark):
    """Docs 1 and 2 share the exact 6-token passage "p q r s t u"
    (positions 3-8 in doc 1, 1-6 in doc 2); doc 3 is all-unique."""
    return _docs(
        spark,
        [
            (1, "a b p q r s t u c d"),
            (2, "p q r s t u x y z w"),
            (3, "m n o aa bb cc dd ee ff gg"),
        ],
    )


def test_spans_cover_exactly_the_shared_passage(shared_passage):
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in _spans(shared_passage).collect()
    }
    # the 6-token passage yields 3 overlapping k=4 windows per doc,
    # merged back into one 6-token span each
    assert got == {(1, 3, 8, 6), (2, 1, 6, 6)}


def test_keep_first_retains_the_min_doc_pos_occurrence(shared_passage):
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in _spans(shared_passage, keep_first=True).collect()
    }
    # doc 1's occurrence is canonical (smaller doc_id); only doc 2 strips
    assert got == {(2, 1, 6)}


def test_strip_removes_one_copy_corpus_wide(shared_passage):
    spans = _spans(shared_passage, keep_first=True)
    out = {
        r.doc_id: r
        for r in spandedup.strip_spans(
            shared_passage, spans, "text", "doc_id"
        ).collect()
    }
    assert out[1].tok_before == 10 and out[1].tok_after == 10
    assert out[2].tok_before == 10 and out[2].tok_after == 4
    assert out[3].tok_after == out[3].tok_before == 10
    # doc 2's surviving text is the tokens outside [1, 6]
    import hashlib

    assert out[2].clean_sig == hashlib.md5(b"x y z w").hexdigest()


def test_within_doc_repeat_counts_as_duplicate(spark):
    docs = _docs(spark, [(1, "p q r s m n p q r s")])
    got = {(r.span_start, r.span_end) for r in _spans(docs).collect()}
    assert got == {(1, 4), (7, 10)}
    # keep-first: the pos-1 occurrence is canonical, pos-7 strips
    kept = {(r.span_start, r.span_end) for r in _spans(docs, keep_first=True).collect()}
    assert kept == {(7, 10)}


def test_adjacent_spans_fuse(spark):
    """Two duplicated windows whose spans touch (end+1 == start) merge
    into one island."""
    docs = _docs(
        spark,
        [
            (1, "a1 a2 a3 a4 b1 b2 b3 b4"),  # windows at 1 and 5 dup'd
            (2, "a1 a2 a3 a4 z1 z2 z3 z4"),
            (3, "y1 y2 y3 y4 b1 b2 b3 b4"),
        ],
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in _spans(docs).collect()
    }
    assert (1, 1, 8, 8) in got  # fused across the adjacency
    assert (2, 1, 4, 4) in got and (3, 5, 8, 4) in got


def test_short_and_empty_docs_are_inert(spark):
    docs = _docs(spark, [(1, "a b c"), (2, ""), (3, None), (4, "a b c")])
    w = spandedup.window_hashes(docs, "text", "doc_id", K)
    assert w.count() == 0  # all shorter than k → no windows, no spans
    spans = _spans(docs)
    out = spandedup.doc_dup_stats(docs, spans, "text", "doc_id").collect()
    assert all(r.dup_tokens == 0 and r.dup_frac == 0.0 for r in out)


def test_doc_stats_sum_matches_span_lengths(shared_passage):
    spans = _spans(shared_passage)
    stats = {
        r.doc_id: r
        for r in spandedup.doc_dup_stats(
            shared_passage, spans, "text", "doc_id"
        ).collect()
    }
    assert stats[1].dup_tokens == 6 and stats[1].dup_frac == 0.6
    assert stats[2].dup_tokens == 6
    assert stats[3].dup_tokens == 0


def test_incremental_strip_against_corpus_index(spark):
    """Batch windows strip when the corpus already holds them (corpus
    seniority), keep-first applies within the batch, and novel batch
    passages survive untouched."""
    corpus = _docs(spark, [(100, "c1 c2 p q r s c3 c4")])
    batch = _docs(
        spark,
        [
            (1, "p q r s b1 b2 b3 b4"),  # corpus passage → stripped
            (2, "n1 n2 n3 n4 x1 n1 n2 n3 n4"),  # within-batch repeat
            (3, "u1 u2 u3 u4 u5 u6 u7 u8"),  # novel → untouched
        ],
    )
    cw = spandedup.window_hashes(corpus, "text", "doc_id", K)
    bw = spandedup.window_hashes(batch, "text", "doc_id", K)
    rem = spandedup.batch_removable_windows(bw, cw, "doc_id")
    spans = spandedup.merge_spans(rem, "doc_id", K)
    out = {
        r.doc_id: r
        for r in spandedup.strip_spans(batch, spans, "text", "doc_id").collect()
    }
    assert out[1].tok_after == 4  # "b1 b2 b3 b4" survives
    assert out[2].tok_after == 5  # first "n1 n2 n3 n4" + "x1" survive
    assert out[3].tok_after == out[3].tok_before == 8


def test_front_door_strip_emits_clean_text(spark, shared_passage):
    from hpv_etl_code_spark import strip_duplicate_passages

    out = {
        r.doc_id: r
        for r in strip_duplicate_passages(
            shared_passage, "text", id_col="doc_id", k=K
        ).collect()
    }
    assert out[1].text_clean == "a b p q r s t u c d"  # canonical copy kept
    assert out[2].text_clean == "x y z w"
    assert out[3].tok_after == 10


def test_merged_spans_never_overlap(spark):
    """Island-merge invariant on a messier corpus: per doc, spans are
    disjoint with at least one token of gap between them."""
    rows = [
        (1, "s1 s2 s3 s4 u1 u2 s1 s2 s3 s4 u3 u4 t1 t2 t3 t4"),
        (2, "s1 s2 s3 s4 v1 v2 v3 t1 t2 t3 t4 v4 v5 v6 v7 v8"),
        (3, "w1 s2 s3 s4 s1 s2 s3 s4 w2 w3 t1 t2 t3 t4 w4 w5"),
    ]
    spans = _spans(_docs(spark, rows)).orderBy("doc_id", "span_start").collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for doc, ss in by_doc.items():
        for (s1, e1), (s2, e2) in zip(ss, ss[1:]):
            assert e1 + 1 < s2, f"doc {doc}: spans {ss} overlap or touch"
