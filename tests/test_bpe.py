"""Invariant tests for operators/bpe.py (oracle equivalence of the two
catalog entries is covered by test_catalog_oracle.py).

The load-bearing claim: a literal non-overlapping left-to-right string
replace on the double-space symbol encoding IS the greedy sequential
BPE merge scan. The hypothesis test proves it against a per-symbol fold
reference on adversarial symbol sequences (consecutive disjoint pairs,
overlapping runs, multi-char symbols from earlier merges).
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from hpv_etl_code_spark.operators import bpe


def _fold_merge(symbols: list[str], lhs: str, rhs: str) -> list[str]:
    """Greedy sequential BPE merge — the textbook reference."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == lhs and symbols[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _encode(symbols: list[str]) -> str:
    return " " + "  ".join(symbols) + " "


def _decode(sym: str) -> list[str]:
    return sym.strip().split("  ")


def _reference_bpe(texts: list[str], k: int):
    """Driver-side reference trainer (word-frequency formulation)."""
    wf: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] += 1
    syms = {w: list(w) for w in wf}
    merges = []
    for rank in range(1, k + 1):
        pc: Counter = Counter()
        for w, f in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        mx = max(pc.values())
        lhs, rhs = min(
            (p for p, c in pc.items() if c == mx), key=lambda p: f"{p[0]} {p[1]}"
        )
        merges.append((rank, lhs, rhs, lhs + rhs, mx))
        syms = {w: _fold_merge(s, lhs, rhs) for w, s in syms.items()}
    return merges, syms


# symbols drawn from a tiny alphabet plus already-merged multi-char
# symbols, maximizing overlap/adjacency collisions
_SYMBOL = st.sampled_from(["a", "b", "c", "ab", "ba", "aa", "abc"])


@given(
    seq=st.lists(_SYMBOL, min_size=1, max_size=12),
    lhs=_SYMBOL,
    rhs=_SYMBOL,
)
@settings(max_examples=200, deadline=None)
def test_replace_equals_fold_reference(seq, lhs, rhs):
    """str.replace on the encoding == the greedy fold, for every symbol
    sequence and merge pair (Python str.replace shares the left-to-right
    non-overlapping semantics of Spark's replace and DuckDB's replace —
    the engine-level agreement is pinned by the oracle entries)."""
    encoded = _encode(seq)
    replaced = encoded.replace(f" {lhs}  {rhs} ", f" {lhs}{rhs} ")
    assert _decode(replaced) == _fold_merge(seq, lhs, rhs)


def test_apply_merge_spark_matches_fold(spark):
    rows = [
        ["a", "b", "a", "b"],  # consecutive disjoint occurrences
        ["a", "a", "a"],  # overlapping run
        ["ab", "a", "b", "ab"],  # multi-char neighbors
        ["b", "a"],  # no match
        ["a"],  # single symbol
    ]
    df = spark.createDataFrame([Row(sym=_encode(r)) for r in rows])
    got = [
        _decode(r.out)
        for r in df.select(bpe.apply_merge(F.col("sym"), "a", "b").alias("out")).collect()
    ]
    assert got == [_fold_merge(r, "a", "b") for r in rows]


def test_bpe_train_matches_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest wide wide wide",
    ]
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe.bpe_train(docs, num_merges=6).orderBy("merge_rank").collect()
    ]
    want, _ = _reference_bpe(texts, 6)
    assert got == want


def test_bpe_train_raises_on_exhausted_corpus(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b")])  # 1-char words only
    with pytest.raises(ValueError, match="exhausted"):
        bpe.bpe_train(docs, num_merges=2)


def test_token_counts_match_reference_and_shrink_monotonically(spark):
    texts = ["banana bandana banana", "an and band banana"]
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    merges_full, syms = _reference_bpe(texts, 4)
    pairs = [(l, r) for _, l, r, _, _ in merges_full]

    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe.bpe_token_counts(docs, pairs).collect()
    }
    want = {
        i: (
            len([w for w in t.split(" ") if w]),
            sum(len(syms[w]) for w in t.split(" ") if w),
        )
        for i, t in enumerate(texts)
    }
    assert got == want

    # more merges never increase the token count of any doc
    prev = {r.doc_id: r.n_bpe_tokens for r in bpe.bpe_token_counts(docs, []).collect()}
    for k in range(1, len(pairs) + 1):
        cur = {
            r.doc_id: r.n_bpe_tokens
            for r in bpe.bpe_token_counts(docs, pairs[:k]).collect()
        }
        assert all(cur[d] <= prev[d] for d in cur)
        prev = cur


def test_bpe_encode_round_trips_and_is_total(spark):
    """Token-id sequences decode back to the original text: each word's
    subwords concatenate to the word, so the whole id sequence mapped
    through the inverse vocabulary and re-joined at word boundaries
    reconstructs every document. Wordless docs stay present with
    n_tokens = 0 (total output)."""
    texts = ["the cat sat on the mat", "the cat", "", "mat mat the"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    learned = bpe.bpe_train(docs, num_merges=3, strict=False).collect()
    merges = [
        (r["lhs"], r["rhs"])
        for r in sorted(learned, key=lambda r: r["merge_rank"])
    ]
    enc = {r.doc_id: r for r in bpe.bpe_encode(docs, merges).collect()}
    vocab = {
        r.token_id: r.subword
        for r in bpe.bpe_vocab(
            bpe.merged_symbols(docs, merges)
        ).collect()
    }
    assert len(enc) == len(texts)
    assert enc[2].n_tokens == 0 and enc[2].token_ids == ""
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = [vocab[int(x)] for x in enc[i].token_ids.split(" ")]
        assert "".join(toks) == t.replace(" ", "")
        assert enc[i].n_tokens == len(toks)
    # ids are dense 0..V-1
    assert sorted(vocab) == list(range(len(vocab)))
