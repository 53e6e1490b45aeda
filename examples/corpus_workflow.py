"""The LLM training-corpus workflow, end to end, on the test corpus:

    raw documents
      → source-mixture sampling     (deterministic hash tickets)
      → PII scrubbing               (regex redaction, JVM-side)
      → quality + language gates    (narrow filters before any shuffle)
      → exact dedup                 (md5 fingerprint, min-id keeper)
      → incremental near-dedup      (new batch vs corpus, LSH buckets)
      → per-epoch shuffle           (range-partitioned portable hash)
      → sequence packing            (greedy token-budget manifests)

Each stage is a catalog operator with its own oracle/tests; this file
shows how they compose for a real ingest. Run:

    python examples/corpus_workflow.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hpv_etl_code_spark import get_spark  # noqa: E402
from hpv_etl_code_spark.operators import textops  # noqa: E402
from hpv_etl_code_spark.operators.dedup import (  # noqa: E402
    dedup_incremental_survivors,
    exact_dedup_keepers,
)
from hpv_etl_code_spark.plans.packing_queries import epoch_shuffle  # noqa: E402
from hpv_etl_code_spark.sources.registry import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="corpus-workflow")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. mixture sampling: keep every src0/src4/... doc, 50% of src1...,
    #    decided by a hash ticket (stable across retries and engines)
    ticket = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("mix:"), "doc_id")), 1, 15), 16, 10)
        .cast("bigint"),
        1000,
    )
    src_num = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    rate = F.when(F.pmod(src_num, 2) == 0, 1000).otherwise(500)
    sampled = docs.filter(ticket < rate)

    # 2-3. hygiene: PII scrub, then quality/language gates (all narrow)
    gated = (
        sampled.withColumn("text", textops.scrub_pii("text"))
        .withColumn("quality", textops.quality_score("text"))
        .filter((F.col("quality") >= 0.2) & F.col("lang").isin("en", "de", "es", "fr"))
    )

    # 4. exact dedup (min-id keeper per content fingerprint)
    keepers = exact_dedup_keepers(gated, "text", "doc_id").select(
        F.col("keeper_id").alias("doc_id")
    )
    exact = gated.join(keepers, "doc_id", "left_semi")

    # 5. incremental near-dedup: treat every 5th doc as "today's batch"
    #    against the rest as the accumulated corpus. Banding is SIZED
    #    FROM THE CORPUS (round 8): fixed parameters are FP-quadratic
    #    in candidates at scale — scaled_lsh_params keeps them linear.
    from hpv_etl_code_spark.operators.dedup import scaled_lsh_params

    new_batch = exact.filter(F.col("doc_id") % 5 == 0)
    corpus = exact.filter(F.col("doc_id") % 5 != 0)
    nh, bands = scaled_lsh_params(corpus.count())
    survivors = dedup_incremental_survivors(
        new_batch,
        corpus,
        "doc_id",
        "text",
        threshold=0.8,
        hash_family="fast",
        num_hashes=nh,
        bands=bands,
    )
    clean = corpus.select("doc_id", "text").unionByName(survivors.select("id", "text").toDF("doc_id", "text"))

    # 6. epoch shuffle: a different deterministic permutation per epoch
    epoch0 = epoch_shuffle(clean, "doc_id", epoch=0, n_shards=16)

    print(f"raw={n0}  sampled={sampled.count()}  gated={gated.count()}")
    print(f"exact-deduped={exact.count()}  batch-survivors={survivors.count()}")
    print(f"clean corpus={clean.count()}  epoch0 shards=16")
    epoch0.select("shard").groupBy("shard").count().orderBy("shard").show(4)
    spark.stop()


if __name__ == "__main__":
    main()
