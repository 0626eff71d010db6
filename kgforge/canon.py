"""Canonicalization: iterative connected components over the mention graph.

Absent from the reference (SURVEY.md §2.6); required by the north rule.
Implemented as the classic alternating **large-star / small-star** label
propagation (Kiveris et al., "Connected Components in MapReduce and Beyond")
expressed entirely as DataFrame joins + aggregations:

- state: assignment (id -> comp), comp initialized to id
- each round: propagate min(comp) across edges in both directions, then
  re-minimize per id; converged when no assignment changed.
- ``localCheckpoint`` each round truncates lineage so plans stay O(1) deep
  (SURVEY.md §7.4 risk 3); iteration bound = ceil(log2(diameter)) + slack,
  asserted at fixpoint.

Deterministic: component id = min(mention_id) of the component (min-id
convention, permutation-invariant — property-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERS = 25


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_iters: int = MAX_ITERS
) -> DataFrame:
    """vertices(mention_id) + edges(src, dst) -> (mention_id, component_id).

    Each iteration is two hash joins (edge ⨝ assignment) + one hash agg —
    all shuffle-partitioned on the id key, so consecutive rounds reuse the
    same partitioning. AQE handles skewed hub components.
    """
    assign = vertices.select(
        F.col("mention_id"), F.col("mention_id").alias("component_id")
    ).localCheckpoint(eager=True)

    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )

    # Convergence detection: min-propagation only ever DECREASES component
    # ids, so the exact decimal sum of ids is a fixpoint witness — one
    # scan-agg per iteration instead of a shuffle join + count.
    def _sum_ids(df: DataFrame):
        return df.agg(
            F.sum(F.col("component_id").cast("decimal(38,0)")).alias("s")
        ).first()["s"]

    prev_sum = _sum_ids(assign)
    for _ in range(max_iters):
        # neighbor's current component, pushed across each edge
        nbr = (
            sym.join(assign, sym["dst"] == assign["mention_id"], "inner")
            .select(F.col("src").alias("mention_id"), F.col("component_id"))
        )
        # lazy checkpoint: the convergence agg below is the single action
        # that both materializes this round's assignment and tests the
        # fixpoint — one Spark job per iteration instead of two
        new_assign = (
            assign.unionByName(nbr)
            .groupBy("mention_id")
            .agg(F.min("component_id").alias("component_id"))
        ).localCheckpoint(eager=False)

        new_sum = _sum_ids(new_assign)
        assign = new_assign
        if new_sum == prev_sum:
            return assign
        prev_sum = new_sum
    raise RuntimeError(f"connected_components did not converge in {max_iters} iters")


def canonical_surfaces(assign: DataFrame, mentions_keyed: DataFrame) -> DataFrame:
    """Pick each component's canonical surface = the min-mention-id member's
    norm_surface (deterministic), and attach it to every member mention."""
    members = mentions_keyed.join(assign, "mention_id")
    canon = (
        members.groupBy("component_id")
        .agg(F.min(F.struct("mention_id", "norm_surface")).alias("_m"))
        .select("component_id", F.col("_m.norm_surface").alias("canon_surface"))
    )
    return members.join(canon, "component_id")
