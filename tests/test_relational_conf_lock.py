"""The scoped spark.sql.cteRecursionRowLimit override must be
serialized (VERDICT r5 #8): concurrent catalog queries on the shared
session can neither observe the raised guard mid-flight nor clobber
the restore."""

from __future__ import annotations

import threading

from hpv_etl_code_spark.plans import relational_queries as rq


def test_recursive_cte_conf_guard_is_locked(spark, sf_dir, monkeypatch):
    """The recursion's spark.sql call happens WITH the lock held, and
    the conf is restored afterwards."""
    conf_key = "spark.sql.cteRecursionRowLimit"
    prior = spark.conf.get(conf_key, None)
    observed: list[bool] = []
    real_sql = spark.sql

    def spy(query, *a, **k):
        if "WITH RECURSIVE" in query:
            observed.append(rq._CTE_CONF_LOCK.locked())
        return real_sql(query, *a, **k)

    monkeypatch.setattr(spark, "sql", spy)
    out = rq.recursive_ancestor_depth(spark, sf_dir)
    assert out.count() > 0
    assert observed == [True], "recursion must run under the conf lock"
    assert spark.conf.get(conf_key, None) == prior


def test_recursive_cte_concurrent_calls_agree_and_restore(spark, sf_dir):
    conf_key = "spark.sql.cteRecursionRowLimit"
    prior = spark.conf.get(conf_key, None)
    results: list = []
    errors: list = []

    def run():
        try:
            rows = sorted(
                (r.depth, r.n_nodes)
                for r in rq.recursive_ancestor_depth(spark, sf_dir).collect()
            )
            results.append(rows)
        except Exception as exc:  # noqa: BLE001 — surfaced in the assert
            errors.append(exc)

    threads = [threading.Thread(target=run) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(results) == 3
    assert results[1] == results[0] and results[2] == results[0]
    assert spark.conf.get(conf_key, None) == prior
