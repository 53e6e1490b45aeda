"""DSIR data-selection tests (operators/dsir.py + plans/selection_queries.py).

The synthetic documents corpus shares one vocabulary across languages,
so its importance distribution is near-flat (the catalog entries
certify the computation there). The BEHAVIOR — selection shifting the
mixture toward the target domain — is proved here on a corpus with
genuine domain signal, and the exact-integer weight accumulation is
pinned against an independent Python/md5 reference.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from hpv_etl_code_spark.operators import dsir


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_grams(text: str) -> list[str]:
    ts = text.split(" ")
    return ts + [f"{a}_{b}" for a, b in zip(ts, ts[1:])]


def _py_logw_micro(text: str, lam: dict[int, int]) -> int:
    return sum(lam.get(_py_hash60("f|" + g) % dsir.N_BUCKETS, 0) for g in _py_grams(text))


def test_dsir_select_front_door_matches_pipeline(spark):
    """The one-call composition equals the staged fit→score→topk."""
    rows = [(i, f"w{i % 7} common t{i % 3} x{i}", "en") for i in range(40)]
    docs = _docs(spark, rows)
    target = docs.filter(F.col("doc_id") % 4 == 0)
    raw = docs.filter(F.col("doc_id") % 4 != 0)
    got = dsir.dsir_select(raw, target, "text", "doc_id", 5).collect()
    tagged = raw.select("doc_id", "text", F.lit(False).alias("t")).unionByName(
        target.select("doc_id", "text", F.lit(True).alias("t"))
    )
    lam = dsir.importance_lambda(dsir.bucket_counts(tagged, "text", F.col("t")))
    staged = dsir.gumbel_topk(
        dsir.doc_logweights(raw, "text", "doc_id", lam), "doc_id", 5
    ).collect()
    key = lambda r: (r.doc_id, r.logw_micro, r.key_micro)  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, staged))
    assert len(got) == 5


@pytest.fixture(scope="module")
def signal_corpus(spark):
    """60 docs: 10 target (wiki-style tokens), 25 raw wiki-like,
    25 raw web-spam-like — real domain signal."""
    wiki = "history science theory archive citation reference volume"
    spam = "click buy cheap deal offer win prize now"
    rows = []
    for i in range(10):
        rows.append((1000 + i, wiki + f" article {i % 3}", "en"))
    for i in range(25):
        rows.append((i, wiki + f" essay {i % 5}", "raw"))
    for i in range(25, 50):
        rows.append((i, spam + f" banner {i % 5}", "raw"))
    return _docs(spark, rows)


def _fit(docs):
    counts = dsir.bucket_counts(docs, "text", F.col("lang") == "en")
    return dsir.importance_lambda(counts)


def test_weights_match_python_reference(spark, signal_corpus):
    """Spark's integer micro-unit accumulation equals an independent
    Python md5 implementation doc-for-doc (exactness, not closeness)."""
    lam_df = _fit(signal_corpus)
    lam = {r["bucket"]: r["lam_micro"] for r in lam_df.collect()}
    corpus = signal_corpus.filter(F.col("lang") != "en")
    got = {
        r["doc_id"]: r["logw_micro"]
        for r in dsir.doc_logweights(corpus, "text", "doc_id", lam_df).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    assert len(got) == 50
    for doc_id, text in texts.items():
        assert got[doc_id] == _py_logw_micro(text, lam), doc_id


def test_selection_shifts_toward_target(spark, signal_corpus):
    """Top-20 of 50 raw docs by Gumbel key is dominated by the
    target-like (wiki-vocabulary) half — the DSIR effect itself."""
    lam_df = _fit(signal_corpus)
    corpus = signal_corpus.filter(F.col("lang") != "en")
    w = dsir.doc_logweights(corpus, "text", "doc_id", lam_df)
    sel = dsir.gumbel_topk(w, "doc_id", 20)
    ids = [r["doc_id"] for r in sel.collect()]
    assert len(ids) == 20
    wiki_like = sum(1 for i in ids if i < 25)
    assert wiki_like >= 16  # 40% of pool takes >=80% of the selection
    # and the weights themselves separate the domains
    rows = w.collect()
    mean_wiki = sum(r["logw_micro"] for r in rows if r["doc_id"] < 25) / 25
    mean_spam = sum(r["logw_micro"] for r in rows if r["doc_id"] >= 25) / 25
    assert mean_wiki > mean_spam + 1_000_000  # > 1 nat apart


def test_gumbel_noise_is_deterministic_and_gumbel_shaped(spark, signal_corpus):
    """Same ids → identical keys across plans; noise matches the
    closed-form −ln(−ln((h+0.5)/2^60)) in micro-units."""
    ids = signal_corpus.select("doc_id").distinct()
    a = {r["doc_id"]: r["g"] for r in ids.select("doc_id", dsir.gumbel_key_micro("doc_id").alias("g")).collect()}
    b = {r["doc_id"]: r["g"] for r in ids.select("doc_id", dsir.gumbel_key_micro("doc_id").alias("g")).collect()}
    assert a == b
    for doc_id, g in list(a.items())[:10]:
        u = (_py_hash60(f"u|{doc_id}") + 0.5) / float(dsir.HASH_SPACE)
        assert g == round(-math.log(-math.log(u)) * dsir.MICRO)


def test_empty_text_doc_scores_zero(spark):
    """A blank document survives the left join with (0, 0), not a
    dropped row — corpus row count is preserved."""
    docs = _docs(
        spark,
        [(1, "history science", "en"), (2, "", "raw"), (3, "click buy", "raw")],
    )
    lam_df = _fit(docs)
    corpus = docs.filter(F.col("lang") != "en")
    w = dsir.doc_logweights(corpus, "text", "doc_id", lam_df)
    rows = {r["doc_id"]: r for r in w.collect()}
    assert set(rows) == {2, 3}
    # '' splits to [''], one unigram — still scored, never null
    assert rows[2]["n_grams"] == 1
    assert rows[3]["n_grams"] == 3  # 2 unigrams + 1 bigram


def test_catalog_entries_run_at_test_sf(spark, sf_dir):
    from hpv_etl_code_spark.plans import selection_queries as sq

    w = sq.dsir_importance_weights(spark, sf_dir)
    assert w.columns == ["doc_id", "n_grams", "logw"]
    n = w.count()
    assert n > 0
    topk = sq.dsir_resample_topk(spark, sf_dir).collect()
    assert len(topk) == min(sq.K, n)
    keys = [r["gumbel_key"] for r in topk]
    assert keys == sorted(keys, reverse=True)
    mix = sq.dsir_mixture_shift(spark, sf_dir)
    rows = mix.collect()
    assert sum(r["n_sel"] for r in rows) == min(sq.K, n)
