"""Extreme-text robustness: the text-processing entries must handle
non-ASCII and adversarial strings — emoji, CJK (no spaces to tokenize
on), combining accents, control characters, zero-width joiners, very
long single tokens, RTL text — without crashing, and the portable-hash
entries must stay engine-parity on them (md5 over UTF-8 bytes is
identical in Spark and DuckDB only if both see the same encoding —
this locks that assumption).
"""

from __future__ import annotations

import pytest

from hpv_etl_code_spark import catalog
from hpv_etl_code_spark.sources.registry import load_table

WEIRD_TEXTS = (
    "héllo wörld naïve café résumé",                       # combining accents
    "日本語のテキスト 中文文本 한국어 텍스트",                    # CJK, few spaces
    "🚀 emoji 🎉 everywhere 🤖🤖🤖 and some text",            # emoji
    "mixed العربية text עברית here",                        # RTL segments
    "a" * 5000,                                            # one huge token
    "tab\tand\nnewline\rand\x0bvertical",                  # control chars
    "zero​width‍joiner﻿text",               # zw chars + BOM
    "",                                                    # empty
    "    ",                                                # whitespace only
    "ligature ﬁ ﬂ and ß sharp s and İ dotted",             # casing traps
)

TEXT_ENTRIES = (
    "text_metrics",
    "text_token_stats",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "text_pii_scrub",
    "text_winnowing",
    "bm25_topk_docs",
    "dedup_exact_content",
    "dedup_minhash_portable",
    "user_journey_paths",  # unaffected table, sanity that fixtures are complete
)


@pytest.fixture(scope="module")
def unicode_sf_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("uni_sf")
    # replace documents with the adversarial corpus (cycled to ~100 rows
    # so banding/grouping paths see multiple docs per text)
    rows = [
        (i, WEIRD_TEXTS[i % len(WEIRD_TEXTS)], "xx", "synthetic", None)
        for i in range(100)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "embeddings",
    ):
        load_table(spark, sf_dir, t).write.parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", TEXT_ENTRIES)
def test_text_entry_survives_adversarial_unicode(spark, unicode_sf_dir, name):
    catalog.entries()[name].fn(spark, unicode_sf_dir).collect()


def test_portable_hash_parity_on_unicode(spark, sf_dir, tmp_path_factory):
    """The md5-over-UTF-8 portable family must hash-match DuckDB on
    non-ASCII text — a full differential compare of the exact-dedup
    entry over the adversarial corpus MINUS the one documented engine
    boundary (locale-tailored case folding: Turkish dotted İ — Java and
    DuckDB lower() disagree there by design; see
    operators/textops.py::normalize_text). Catching the \\s-vs-RE2
    vertical-tab divergence was this test's first find."""
    from hpv_etl_code_spark.sources.registry import load_table
    from tests.oracle_util import compare

    d = tmp_path_factory.mktemp("uni_parity")
    rows = [
        (i, t, "xx", "synthetic", None)
        for i, t in enumerate(WEIRD_TEXTS)
        if "İ" not in t
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        load_table(spark, sf_dir, t).write.parquet(str(d / f"{t}.parquet"))
    entry = catalog.entries()["dedup_exact_content"]
    compare(entry.fn(spark, str(d)), entry.oracle, str(d))


def test_winnowing_parity_on_unicode(spark, sf_dir, tmp_path_factory):
    """Winnowing fingerprints hash raw tokens (no case folding), so
    parity must hold on the FULL adversarial corpus including the
    casing-trap text — md5 over UTF-8 bytes is engine-stable."""
    from hpv_etl_code_spark.sources.registry import load_table
    from tests.oracle_util import compare

    d = tmp_path_factory.mktemp("uni_winnow")
    rows = [
        (i, t, "xx", "synthetic", None) for i, t in enumerate(WEIRD_TEXTS)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        load_table(spark, sf_dir, t).write.parquet(str(d / f"{t}.parquet"))
    entry = catalog.entries()["text_winnowing"]
    compare(entry.fn(spark, str(d)), entry.oracle, str(d))
