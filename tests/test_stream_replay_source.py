"""The shared streaming replay source (VERDICT r6 #4): all streaming-
execution catalog entries consume ONE 4-file parquet copy of events per
(session, sf_dir) — one write total, md5-keyed (portable), and the
entries still match their batch twins (their oracles hash-check that in
the catalog mirror; here we pin the single-write invariant)."""

from __future__ import annotations

import os

from hpv_etl_code_spark import catalog
from hpv_etl_code_spark.plans.artifacts import _key_digest, _scratch_dir


def _replay_dir(spark, sf_dir: str) -> str:
    return os.path.join(
        _scratch_dir(spark), f"events_replay_{_key_digest(sf_dir)}"
    )


def test_one_replay_write_per_session(spark, sf_dir):
    es = catalog.entries()
    src = _replay_dir(spark, sf_dir)
    marker = os.path.join(src, "_SUCCESS")

    es["ab_stats_stream"].fn(spark, sf_dir).collect()
    assert os.path.exists(marker)
    mtime = os.path.getmtime(marker)

    es["bottomk_quantile_stream"].fn(spark, sf_dir).collect()
    es["cuped_stream"].fn(spark, sf_dir).collect()
    assert os.path.getmtime(marker) == mtime, "replay source rewritten"

    # and no per-entry copies exist anymore (the round-6 layout)
    scratch = _scratch_dir(spark)
    stale = [
        d for d in os.listdir(scratch)
        if d.startswith(("ab_stream_src_", "cuped_stream_src_",
                         "bottomk_stream_src_"))
    ]
    assert stale == [], stale
