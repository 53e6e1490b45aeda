"""Invariant tests for operators/decontam.py (the oracle equivalence of
the catalog entries is covered by test_catalog_oracle.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from hpv_etl_code_spark.operators import decontam, textops


def test_word_ngrams_short_doc_guard(spark):
    df = spark.createDataFrame(
        [Row(t="a b c d"), Row(t="a b"), Row(t="")]
    ).select(textops.word_ngrams("t", 3).alias("g"))
    got = [r.g for r in df.collect()]
    assert got == [["a_b_c", "b_c_d"], [], []]


def test_decontaminate_self_flags_everything(spark):
    """Every doc with ≥1 trigram overlaps itself when the eval set IS
    the corpus."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"w{i} x y z common tail") for i in range(6)]
    )
    out = decontam.decontaminate(docs, docs, n=3).collect()
    assert {r.doc_id for r in out} == set(range(6))
    assert all(r.contaminated for r in out)


def test_decontaminate_disjoint_vocab_is_empty(spark):
    corpus = spark.createDataFrame([Row(doc_id=1, text="a b c d e")])
    evalset = spark.createDataFrame([Row(doc_id=2, text="p q r s t")])
    assert decontam.decontaminate(corpus, evalset, n=3).count() == 0


def test_repetition_score_bounds_and_known_values(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, t="a b c a b c a b c"),  # repeated trigrams
            Row(doc_id=2, t="a b c d e f"),  # all distinct
            Row(doc_id=3, t="a b"),  # shorter than n
        ]
    ).select("doc_id", decontam.repetition_score("t", 3).alias("r"))
    got = {r.doc_id: r.r for r in df.collect()}
    # 7 trigrams, 3 distinct → 1 - 3/7
    assert abs(got[1] - round(1 - 3 / 7, 6)) < 1e-9
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_tfidf_rare_term_outranks_common(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=("common " * 3 + f"rare{i}").strip()) for i in range(4)]
    )
    top1 = (
        decontam.tfidf_top_terms(docs, k=1)
        .filter(F.col("term_rank") == 1)
        .collect()
    )
    # 'common' appears in every doc (idf = ln(5/5) = 0) so the unique
    # term must win despite tf 1 vs 3.
    assert {r.term for r in top1} == {f"rare{i}" for i in range(4)}


def test_pii_scrub_redacts_all_three_kinds(spark):
    from hpv_etl_code_spark.operators.textops import scrub_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("mail a.b+c@x-corp.co.uk call 555-0199 or 020 7946 0000 ip 192.168.0.1 done",)],
        ["t"],
    )
    out = df.select(scrub_pii("t").alias("s")).collect()[0]["s"]
    assert "<EMAIL>" in out and "<IP>" in out and "<PHONE>" in out
    assert "@" not in out and "192.168" not in out and "555-0199" not in out


def test_chunk_dedup_flags_shared_chunks(spark):
    from hpv_etl_code_spark.operators.textops import token_chunks
    from pyspark.sql import functions as F

    boiler = " ".join(f"b{i}" for i in range(16))
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(16))
    df = spark.createDataFrame(
        [(1, boiler + " " + uniq("x")), (2, boiler + " " + uniq("y"))],
        ["doc_id", "text"],
    )
    c = df.select("doc_id", F.explode(token_chunks("text", 16)).alias("chunk"))
    nd = c.groupBy("chunk").agg(F.countDistinct("doc_id").alias("nd"))
    shared = {r["chunk"][:2] for r in nd.filter("nd > 1").collect()}
    assert shared == {"b0"[:2]}  # only the boilerplate chunk is cross-doc
