"""Post-execution plan profiler: per-node RUNTIME metrics (shuffle
bytes, spill, peak memory, scan sizes) pulled from the executed
physical plan.

`.explain()` shows the plan you asked for; this shows what it COST.
The walk reads each SparkPlan node's SQLMetric values after forcing the
DataFrame's own QueryExecution (a separate ``df.count()`` would execute
a different QueryExecution and leave these metrics at zero — the trap
this module exists to avoid). AQE is handled: the adaptive root is
unwrapped to its final plan and QueryStageExec wrappers are descended
into.

This is the "measure, don't guess" layer behind SCALING.md: shuffle
volume is THE scale currency — a query whose shuffle bytes grow faster
than its input is the one that dies at 100 TB, whatever its local wall
time says. ``scripts/plan_profile.py`` dumps these summaries for every
headline query.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_KEEP = (
    "numOutputRows",
    "shuffleBytesWritten",
    "shuffleRecordsWritten",
    "spillSize",
    "dataSize",
    "peakMemory",
    "numFiles",
    "filesSize",
)


@dataclass
class PlanProfile:
    rows: int = 0
    shuffle_bytes: int = 0
    shuffle_records: int = 0
    spill_bytes: int = 0
    peak_memory: int = 0  # max over nodes
    scan_files: int = 0
    scan_bytes: int = 0
    n_exchanges: int = 0
    n_broadcasts: int = 0
    nodes: list = field(default_factory=list)  # (depth, name, {metric: value})

    def as_dict(self) -> dict:
        return {
            "rows": self.rows,
            "shuffle_bytes": self.shuffle_bytes,
            "shuffle_records": self.shuffle_records,
            "spill_bytes": self.spill_bytes,
            "peak_memory": self.peak_memory,
            "scan_files": self.scan_files,
            "scan_bytes": self.scan_bytes,
            "n_exchanges": self.n_exchanges,
            "n_broadcasts": self.n_broadcasts,
        }


def _node_metrics(node) -> dict:
    out = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        k = kv._1()
        if k in _KEEP:
            v = kv._2().value()
            if v:
                out[k] = v
    return out


def materialize(df: DataFrame) -> int:
    """Fully execute ``df``'s OWN physical plan and return its row
    count.

    ``df.count()`` is NOT full execution: Catalyst re-optimizes the
    count aggregate and prunes every row-preserving subtree — pure
    projections collapse to a parquet-footer count, windows with no
    downstream filter vanish, and unique-key left joins are eliminated
    outright (round-9 audit: 21 catalog entries collapsed to a bare
    source count under ``.count()``, including two bench headliners).
    Executing the DataFrame's already-planned ``executedPlan`` at the
    RDD level (the same seam :func:`execute_and_profile` uses) computes
    every output column with zero re-optimization and no extra hashing
    cost — the honest timing action for bench.py and the scale
    rehearsal."""
    return df._jdf.queryExecution().executedPlan().execute().count()


def execute_and_profile(df: DataFrame) -> PlanProfile:
    """Force the DataFrame's OWN QueryExecution and aggregate its
    runtime metrics. Returns a :class:`PlanProfile`; ``nodes`` carries
    the per-node detail for drill-down."""
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan()
    prof = PlanProfile()
    prof.rows = plan.execute().count()

    root = plan
    if "Adaptive" in root.getClass().getName():
        root = root.executedPlan()

    def walk(node, depth: int) -> None:
        name = node.nodeName()
        metrics = _node_metrics(node)
        if metrics:
            prof.nodes.append((depth, name, metrics))
        if name.startswith("Exchange"):
            prof.n_exchanges += 1
            prof.shuffle_bytes += metrics.get("shuffleBytesWritten", 0)
            prof.shuffle_records += metrics.get("shuffleRecordsWritten", 0)
        if name.startswith("BroadcastExchange"):
            prof.n_broadcasts += 1
        if name.startswith("Scan"):
            prof.scan_files += metrics.get("numFiles", 0)
            prof.scan_bytes += metrics.get("filesSize", 0)
        prof.spill_bytes += metrics.get("spillSize", 0)
        prof.peak_memory = max(prof.peak_memory, metrics.get("peakMemory", 0))
        cls = node.getClass().getName()
        if "QueryStage" in cls:
            walk(node.plan(), depth + 1)
        for i in range(node.children().size()):
            walk(node.children().apply(i), depth + 1)

    walk(root, 0)
    return prof
