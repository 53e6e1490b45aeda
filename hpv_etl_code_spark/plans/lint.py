"""Physical-plan linter: mechanical detection of the anti-patterns that
kill queries at cluster scale.

The engine's own entries are plan-asserted one by one in tests; this
module generalizes those checks so ANY user DataFrame can be gated
before it ships to a 1000-executor cluster:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` with a non-trivial
  build side → O(n·m) blow-up (a broadcast nested loop against a 1-row
  aggregate is fine and common — scalar subqueries, literal bounds —
  so findings carry the node text for triage).
- ``BatchEvalPython`` → row-at-a-time Python UDF in the plan (the slow
  path; ArrowEvalPython / mapInPandas stages are fine and NOT flagged).
- A global ``Sort`` that is not followed by a limit (TakeOrderedAndProject
  handles sorted-top-k without one) → full-data sort on one ordering.
- ``Exchange SinglePartition`` feeding a data-sized subtree → the whole
  input funnels through one task (windows with no PARTITION BY being the
  classic cause).

The linter is heuristic by design — it reads ``explain`` output, the
same evidence a human reviewer uses, and returns findings instead of
raising so callers decide the policy.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    rule: str
    detail: str


def _plan_text(df: DataFrame, mode: str = "simple") -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            mode
        )
    )


def lint_plan(df: DataFrame) -> list[Finding]:
    """Inspect the optimized physical plan for scale anti-patterns."""
    text = _plan_text(df)
    findings: list[Finding] = []

    for line in text.splitlines():
        s = line.strip()
        if "CartesianProduct" in s:
            findings.append(Finding("cartesian-product", s[:200]))
        if "BatchEvalPython" in s:
            findings.append(Finding("row-python-udf", s[:200]))

    # BroadcastNestedLoopJoin: flag only when neither side looks like a
    # metadata aggregate (the 1-row bounds/stats idiom). The whitelist
    # is textual: a grand-total build side shows up in the join's
    # subtree as an ungrouped HashAggregate (keys=[]) under the
    # BroadcastExchange — a data×data cross join has a scan there
    # instead. (Round 9: this excusal was documented but unimplemented,
    # flagging every `counts ⨯ broadcast(totals)` grand-total attach.)
    if "BroadcastNestedLoopJoin" in text:
        for m in re.finditer(r"BroadcastNestedLoopJoin.*Cross.*", text):
            # the cross build side broadcasts with IdentityBroadcastMode;
            # check what sits directly under that exchange (no window
            # cap — the streamed subtree above it can be arbitrarily
            # large, e.g. the composed pipeline's LSH chain)
            subtree = text[m.end() :]
            b = re.search(r"BroadcastExchange IdentityBroadcastMode", subtree)
            build_head = subtree[b.end() : b.end() + 600] if b else ""
            if re.search(r"HashAggregate\s*\(?keys=\[\]", build_head):
                continue
            findings.append(Finding("nested-loop-cross-join", m.group(0).strip()[:200]))

    # global single-partition exchange: SinglePartition is legitimate for
    # metadata-sized inputs (1-row aggregates, bucket counts); flag when
    # the subtree below it contains a raw file scan with no aggregation
    for m in re.finditer(r"Exchange SinglePartition", text):
        tail = text[m.end() : m.end() + 2000]
        # walk the indented subtree textually: an un-aggregated scan
        # directly under the exchange means data-sized funneling
        subtree = tail.split("Exchange", 1)[0]
        if "FileScan" in subtree and "Aggregate" not in subtree:
            findings.append(
                Finding(
                    "single-partition-data-exchange",
                    "Exchange SinglePartition over an un-aggregated scan "
                    "(global window or orderBy without limit?)",
                )
            )

    # full sort without limit: a GLOBAL Sort is fine over aggregated
    # (metadata-sized) input — ORDER BY on a grouped result — but a
    # global sort whose input subtree is a raw scan re-orders the whole
    # dataset through one range exchange
    for m in re.finditer(r"\bSort \[.*\], true,", text):
        # scope the limit check to THIS Sort's immediate ancestors (the
        # few lines above it) — a top-k subquery elsewhere in the plan
        # must not excuse an unrelated full-data Sort (whole-plan
        # matching was a false negative; same scoping idea as the
        # SinglePartition rule)
        above = "\n".join(text[: m.start()].splitlines()[-4:])
        if (
            "TakeOrderedAndProject" in above
            or "GlobalLimit" in above
            or "CollectLimit" in above
        ):
            continue
        below = text[m.end() :]
        if "FileScan" in below and not re.search(r"Aggregate", below):
            findings.append(
                Finding(
                    "global-sort-no-limit",
                    "globally-ordered Sort over un-aggregated data with "
                    "no limit — full-data sort",
                )
            )
            break

    return findings


def assert_scalable(df: DataFrame, allow: tuple[str, ...] = ()) -> None:
    """Raise AssertionError listing findings (minus ``allow``-listed
    rules) — the one-liner for test suites and CI gates."""
    findings = [f for f in lint_plan(df) if f.rule not in allow]
    if findings:
        msg = "\n".join(f"  [{f.rule}] {f.detail}" for f in findings)
        raise AssertionError(f"plan fails scale lint:\n{msg}")
