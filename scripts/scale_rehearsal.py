"""Two-decade scale rehearsal (VERDICT r6 #3): run the scale-critical
catalog entries at sf0.1 → sf1 → sf10 and report per-decade wall-time
exponents (log10 of the time ratio across each 10× data step — 1.0 is
linear, <1 sub-linear, >1 super-linear).

Entries here are the ones whose 100 TB story depends on plan SHAPE
(dedup banding, ANN indexes, graph aggregates, global indexes, corpus
pipelines); exact-quadratic ground-truth entries (knn_graph,
embedding_neardup_pairs/blocked, exact clustering coefficient) are
adjudicated in SCALING.md — their sampled/banded twins are the scale
path and ARE measured here.

Usage: python scripts/scale_rehearsal.py [entry ...]
Emits one markdown table row per entry + a JSON line for the record.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = (
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/.scratch/sf1"),
    ("sf10", "/root/repo/.scratch/sf10"),
    # third-decade spot check (VERDICT r8 #5): sf30 is a 3x step from
    # sf10, so its per-DECADE exponent is log(t30/t10)/log10(3). Only
    # visited when explicitly asked for via SPARK_GRAFT_SCALES=sf30
    # (or sf10,sf30) — the default sweep stays two decades.
    ("sf30", "/root/repo/.scratch/sf30"),
)

SCALE_CRITICAL = (
    # dedup family
    "dedup_exact_content",
    "dedup_minhash_portable",
    "dedup_minhash_lsh",
    "dedup_minhash_shingles",
    "dedup_simhash_portable",
    "dedup_incremental",
    "dedup_incremental_fast",
    "dedup_components_portable",
    "dedup_components_fast",
    "dedup_cluster_sizes_indexed",
    # text analysis at corpus scale
    "text_winnowing",
    "text_metrics",
    "unigram_ce_bands",
    "bm25_topk_docs",
    # corpus pipeline + packing/mixing
    "llm_corpus_pipeline",
    "sequence_packing",
    "corpus_epoch_shuffle",
    "corpus_epoch_shuffle_bucketed",
    "mixture_reweight_rounds",
    # ANN / embeddings (banded & indexed paths)
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivf_indexed",
    "ann_ivf_append",
    "ann_pq_topk",
    "embedding_neardup_lsh",
    "embedding_neardup_scaled",
    "embedding_dedup_survivors_scaled",
    # graph health (bounded-cost variants)
    "clustering_coefficient_sampled",
    "bfs_hops_copurchase",
    "pagerank_orders_graph",
    "market_basket_rules",
    # trained-model primitives (round 9: fixed-pass scans — measured to
    # certify the linear story, not because a blow-up is plausible)
    "quality_classifier_train",
    "classifier_gated_corpus",
    "pca_top_component",
    "pca_projection_hist",
    "kmeans_cluster_profile",
    # data selection (round 9: DSIR importance resampling — two corpus
    # scans, a B-row broadcast between them; top-k is TakeOrdered)
    "dsir_importance_weights",
    "dsir_resample_topk",
    # duplicated-passage dedup (round 9: token-scale window table,
    # one hash exchange + one doc exchange; strip never explodes)
    "dup_passage_spans",
    "corpus_strip_duplicate_passages",
    "passage_strip_incremental",
    "llm_corpus_pipeline_select",
    # relational backbone
    "global_index_orders",
    "pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "salted_fact_join",
    "range_join_events",
    "asof_join_signup",
    "sessionize_events",
)


# (entry, scale) legs excluded by adjudication, with the plan-level
# cause — printed into the report so the table shows WHY, not a hole.
EXCLUDE = {
    ("embedding_neardup_lsh", "sf10"):
        "fixed nbits=4 (the gate-scale oracle pin) keeps the bucket "
        "count constant, so occupancy ∝ n and candidate pairs ∝ n² — "
        "the PRODUCTION path is embedding_neardup_scaled (round 8: "
        "scaled_ann_params sizes nbits = ceil(log2(n/64)); measured "
        "sf10 exponent 0.89, in this sweep), same adjudication class "
        "as dedup_minhash_portable's (16, 4) pin below",
    ("llm_corpus_pipeline_select", "sf10"):
        "its near-dup stage is the flat PORTABLE md5 miner (the "
        "oracle-certification regime, fixed (16, 4) banding) — the "
        "same per-band full-signature materialization that disk-fails "
        "dedup_minhash_portable at sf10 (below); the production-shape "
        "scale path for every stage is measured separately "
        "(llm_corpus_pipeline for gates+dedup, "
        "corpus_strip_duplicate_passages for the passage stage, "
        "dsir_resample_topk for selection — all in this sweep)",
    ("dedup_minhash_portable", "sf10"):
        "the CERTIFICATION twin materializes every per-band full-"
        "signature row for the DuckDB hash-compare (~n·bands wide rows "
        "≈ 10^8.5 × ~0.5 KB at sf10 — it filled this host's spill "
        "disk and took the local JVM down); the production query is "
        "dedup_minhash_lsh (narrow band-bucket rows), measured at sf10",
}


def _run_isolated(name: str, sf_dir: str) -> tuple[float | None, int | None, str]:
    """Run one (entry, scale) leg in its own subprocess/JVM.

    A heap-OOM at the largest scale kills the whole JVM, and a dead
    py4j gateway cannot be revived in-process (the round-9 sf30 sweep
    lost its remaining legs to 'stopped SparkContext' cascades) — so
    the third-decade legs each get a fresh process. Timing includes
    plan+execute but NOT session startup (timed inside the child).
    """
    import subprocess

    code = (
        "import sys, time, json\n"
        "sys.path.insert(0, %r)\n"
        "from hpv_etl_code_spark import catalog\n"
        "from hpv_etl_code_spark.session import get_spark\n"
        "spark = get_spark(app_name='scale_leg')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "from hpv_etl_code_spark.plans.profile import materialize\n"
        "t0 = time.perf_counter()\n"
        "rows = materialize(catalog.entries()[%r].fn(spark, %r))\n"
        "print('LEG_RESULT ' + json.dumps({'dt': time.perf_counter() - t0, 'rows': rows}))\n"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), name, sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    for line in proc.stdout.splitlines():
        if line.startswith("LEG_RESULT "):
            import json as _json

            d = _json.loads(line[len("LEG_RESULT "):])
            return d["dt"], d["rows"], ""
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()
    return None, None, tail[-1][:160] if tail else f"exit {proc.returncode}"


def _sweep_stale_spark_scratch() -> None:
    """Remove orphaned /tmp/blockmgr-* and /tmp/spark-* left by
    heap-OOM'd JVMs (no shutdown hook runs, so tens of GB of shuffle
    spill survive the crash — a later leg then dies on ENOSPC, which is
    exactly what took down the first round-9 sf30 control pass).
    Only sweeps when NO java process is alive, so a concurrent Spark
    session never loses live shuffle files."""
    import glob
    import shutil
    import subprocess

    alive = subprocess.run(
        ["pgrep", "-x", "java"], capture_output=True
    ).returncode == 0
    if alive:
        return
    for p in glob.glob("/tmp/blockmgr-*") + glob.glob("/tmp/spark-*"):
        shutil.rmtree(p, ignore_errors=True)


def main() -> int:
    _sweep_stale_spark_scratch()
    only = set(sys.argv[1:])
    names = [n for n in SCALE_CRITICAL if not only or n in only]
    scales = set(
        s for s in os.environ.get("SPARK_GRAFT_SCALES", "").split(",") if s
    )
    isolate = os.environ.get("SPARK_GRAFT_ISOLATE") == "1"

    from hpv_etl_code_spark import catalog
    from hpv_etl_code_spark.plans import artifacts, shared_cache
    from hpv_etl_code_spark.plans.profile import materialize
    from hpv_etl_code_spark.session import get_spark

    spark = None
    if not isolate:
        spark = get_spark(app_name="scale_rehearsal")
        spark.sparkContext.setLogLevel("ERROR")
    es = catalog.entries()

    def ensure_spark(s):
        """A disk-full spill can take the whole local JVM down — detect
        a stopped context and start a fresh session so one casualty
        doesn't void the rest of the sweep."""
        try:
            if not s.sparkContext._jsc.sc().isStopped():
                return s
        except Exception:  # noqa: BLE001 — unreachable JVM == dead
            pass
        print("-- SparkContext died; starting a fresh session --")
        shared_cache.clear_cache()
        artifacts.clear_cache()
        fresh = get_spark(app_name="scale_rehearsal_r")
        fresh.sparkContext.setLogLevel("ERROR")
        return fresh

    results: dict[str, dict] = {}
    for label, sf_dir in SF_DIRS:
        if scales and label not in scales:
            continue
        if label == "sf30" and label not in scales:
            continue  # opt-in only — see SF_DIRS comment
        if not os.path.isdir(sf_dir):
            print(f"missing {sf_dir} — run scripts/make_sf1.py first")
            return 1
        for name in names:
            if (name, label) in EXCLUDE:
                print(f"{label:6s} {name:34s} SKIP (adjudicated: "
                      f"{EXCLUDE[(name, label)]})")
                continue
            if isolate:
                dt, rows, err = _run_isolated(name, sf_dir)
                if dt is None:
                    results.setdefault(name, {})[label] = None
                    print(f"{label:6s} {name:34s} ERROR {err}")
                else:
                    results.setdefault(name, {})[label] = round(dt, 2)
                    results[name][f"{label}_rows"] = rows
                    print(f"{label:6s} {name:34s} {dt:8.2f}s rows={rows} "
                          f"(isolated)")
                continue
            spark = ensure_spark(spark)
            t0 = time.perf_counter()
            try:
                rows = materialize(es[name].fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                results.setdefault(name, {})[label] = round(dt, 2)
                results[name][f"{label}_rows"] = rows
                print(f"{label:6s} {name:34s} {dt:8.2f}s rows={rows}")
            except Exception as exc:  # noqa: BLE001 — record and continue
                results.setdefault(name, {})[label] = None
                print(f"{label:6s} {name:34s} ERROR {type(exc).__name__}: "
                      f"{str(exc)[:120]}")
        # fresh caches per scale so sf10 never reuses an sf1 artifact
        shared_cache.clear_cache()
        artifacts.clear_cache()

    print("\n| entry | sf0.1 s | sf1 s | sf10 s | exp 0.1→1 | exp 1→10 |")
    print("|---|---|---|---|---|---|")
    for name in names:
        r = results.get(name, {})
        a, b, c = r.get("sf0.1"), r.get("sf1"), r.get("sf10")

        def ex(x, y):
            if not x or not y or x <= 0:
                return "—"
            return f"{math.log10(y / x):.2f}"

        fmt = lambda v: f"{v:.2f}" if isinstance(v, float) else "ERR"  # noqa: E731
        print(
            f"| {name} | {fmt(a)} | {fmt(b)} | {fmt(c)} "
            f"| {ex(a, b)} | {ex(b, c)} |"
        )
    print("\n" + json.dumps({"scale_rehearsal": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
