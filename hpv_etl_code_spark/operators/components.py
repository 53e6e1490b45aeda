"""Connected components over an edge list — the dedup-grouping operator.

LLM-scale dedup pipelines don't stop at near-dup *pairs*: they union the
pairs into clusters and keep one document per cluster (the reference's
surface has nothing like this; it's part of the engine's training-data
toolkit alongside operators/dedup.py). The classic driver-side answer is
union-find, which doesn't distribute; the Spark-native answer here is
min-label propagation with pointer jumping:

- every node starts labeled with its own id;
- each round, a node takes the minimum label among itself and its
  neighbors (one shuffle: edge⋈label + groupBy-min);
- then labels are *pointer-jumped* — relabeled through themselves
  (``label(v) ← label(label(v))``, one self-join) — which halves the
  distance to each component's minimum like union-find path halving.

Pointer jumping turns the O(diameter) rounds of plain propagation into
O(log diameter): a chain of 10⁶ nodes converges in ~20 rounds instead of
10⁶. Each round ends in an eager ``localCheckpoint`` so the plan doesn't
accumulate 2·k joins of lineage, plus one ``count`` action for the
convergence test — per-round driver cost is a scalar, never rows.

Labels are node ids and only ever decrease toward the component minimum,
so the fixpoint is unique and deterministic regardless of partitioning
or join order — which is what lets the catalog entry hash-match a DuckDB
recursive-CTE oracle (plans/text_queries.py::DEDUP_COMPONENTS_SQL).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Checkpoint blocks go to DISK_ONLY (round 9, VERDICT r8 #2): the frames
# are narrow (2-3 longs per row — disk reads per round are trivial), but
# memory-level checkpoint blocks COMPETE with execution memory in the
# unified pool, and the expensive step of a components run is evaluating
# the caller's edge plan (LSH banding + wide-payload Jaccard refine)
# INTO the first checkpoint — at the 10⁶-doc decade with 32 concurrent
# tasks in one JVM that contention was a 16 GiB heap floor
# (UNABLE_TO_ACQUIRE_MEMORY in the refine sort at 8 GiB; SCALING.md ‡).
_CKPT_LEVEL = StorageLevel.DISK_ONLY


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node reachable through ``edges`` with its component's
    minimum node id.

    Returns ``(id, component)`` for nodes that appear in at least one
    edge (isolated nodes aren't in the input and so aren't in the
    output — callers wanting them add a left join at the call site).

    Raises ``RuntimeError`` if the fixpoint isn't reached in
    ``max_iter`` rounds — an unconverged labeling is silently wrong, and
    with pointer jumping 25 rounds covers diameters beyond 10⁶.
    """
    # materialize the edge list ONCE and BEFORE symmetrizing: the union
    # has two branches over the caller's (possibly very expensive —
    # blocked-levenshtein, LSH banding) edge plan, so un-checkpointed it
    # would be evaluated twice per materialization and once per fixpoint
    # round. Round-5 fix: this was 4-20× of the sf0.1 wall time of every
    # components consumer.
    base = edges.select(
        F.col(src).cast("long").alias("e_src"), F.col(dst).cast("long").alias("e_dst")
    ).localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    sym = base.union(
        base.select(F.col("e_dst").alias("e_src"), F.col("e_src").alias("e_dst"))
    )
    labels = (
        sym.select(F.col("e_src").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)

    for _ in range(max_iter):
        # one shuffle: min neighbor label per node
        nbr = (
            sym.join(labels, sym.e_src == labels.id)
            .groupBy(F.col("e_dst").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        merged = (
            labels.join(nbr, "id", "left")
            .select("id", F.least("label", "nbr_label").alias("label"), F.col("label").alias("old"))
        )
        # pointer jump: label(v) ← label(label(v)); label values are node
        # ids, and every node id is a key in `merged`, so the join is total
        parent = merged.select(F.col("id").alias("p_id"), F.col("label").alias("p_label"))
        jumped = (
            merged.join(parent, merged.label == parent.p_id)
            .select("id", F.col("p_label").alias("label"), "old")
        )
        # checkpoint the frame BOTH consumers read: deriving the changed
        # count from the un-checkpointed `jumped` re-ran the round's two
        # joins a second time (round-5 fix — halved per-round cost)
        jumped = jumped.localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
        changed = jumped.filter(F.col("label") != F.col("old")).count()
        labels = jumped.select("id", "label")
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components: no fixpoint after {max_iter} rounds")


def dedup_component_keepers(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One survivor per near-dup cluster: the minimum id of each
    component (``component == id`` at the fixpoint). Returns
    ``(component, n_members)`` — members counted over edge-connected
    nodes; everything else in the corpus survives by definition."""
    comps = connected_components(edges, src=src, dst=dst)
    return comps.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int | None = 5,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list — the
    iterative link-analysis workload class (distinct from the fixpoint
    min-label propagation above).

    Each iteration is one join (edge ⋈ rank ⋈ outdeg) + one aggregation
    shuffle on dst; contributions aggregate through exact decimals
    (``dsum``) so the result is order-independent and differential-
    testable — the catalog oracle UNROLLS the same iterations into CTEs
    (the IVF k-means precedent). Dangling-node mass is not redistributed
    (documented simplification; ranks then need no global re-sum).

    ``checkpoint_every``: eager localCheckpoint cadence — iterative
    plans otherwise accumulate k joins of lineage and the optimizer
    re-analyzes the whole chain each round (the connected-components
    lesson above). The only driver-side values are N (one count) and
    the loop counter.
    """
    from ..functions.numeric import dsum

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # metadata-class scalar
    if n == 0:  # empty graph: no nodes, no ranks (not a crash)
        return nodes.select("node", F.lit(0.0).alias("rank"))
    base = (1.0 - damping) / n  # same IEEE ops as the SQL twin
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("contrib"),
            )
        )
        summed = contribs.groupBy("node").agg(dsum("contrib").alias("s"))
        ranks = nodes.join(summed, "node", "left").select(
            "node",
            (F.lit(base) + damping * F.coalesce("s", F.lit(0.0))).alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
