"""Distributed graph analytics over entity/mention edge lists: scaled-
integer PageRank and degree-oriented triangle counting.

These are the engine-capability forms of q88/q89 (kgforge/queries/
graph_temporal.py): any undirected edge list — the KG's canonical-entity
co-mention graph (pipeline.run_graph emits exactly this shape), the
co-purchase graph, LSH similarity edges — can be ranked for salience or
measured for cohesion. Complements canon.py's connected components (the
third member of the iterative-graph family).

Determinism: PageRank runs entirely in scaled-integer arithmetic
(rank x 10^12, damping num/den, floor `div`), so results are bit-identical
across engines, parallelism levels, and runs — the same property the rest
of the engine holds everywhere (see queries/__init__ docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000_000  # rank 1.0 == 10^12


def symmetrize(pairs: DataFrame) -> DataFrame:
    """Undirected distinct pairs (p1, p2) -> directed edge list (src, dst)
    with both orientations."""
    return pairs.select(
        F.col("p1").alias("src"), F.col("p2").alias("dst")
    ).unionAll(
        pairs.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
    )


def pagerank_scaled(
    pairs: DataFrame,
    iters: int = 4,
    damping: tuple[int, int] = (17, 20),
) -> DataFrame:
    """PageRank over an undirected pair list, in exact scaled integers.

    ``pairs``: DataFrame[p1, p2] of distinct undirected edges (isolated
    nodes — absent from every edge — are out of scope, as in any
    edge-list formulation). Returns DataFrame[node, d, r] with r the rank
    scaled by PR_SCALE.

    Recurrence per node v:
        r'(v) = (den-num)*T // (den*N)  +  num * sum_{u->v}(r(u) div d(u)) div den

    All BIGINT floor arithmetic — no float accumulation, so the result is
    independent of partitioning and engine. Scale shape (q88 docstring has
    the full argument): edges/degrees built once and persisted (at real
    scale: checkpointed to break per-iteration lineage growth); each
    iteration is one co-partitioned equi-join + one partial-agg shuffle on
    dst — the pregel-on-DataFrames shape. The driver loop builds plans,
    never touches rows.
    """
    num, den = damping
    edges = symmetrize(pairs).persist()
    deg = (
        edges.groupBy("src")
        .agg(F.count("*").alias("d"))
        .withColumnRenamed("src", "node")
        .persist()
    )
    n_nodes = deg.count()  # bounded driver-side scalar
    base = ((den - num) * PR_SCALE) // (den * n_nodes)
    r = deg.select("node", "d", F.lit(PR_SCALE // n_nodes).alias("r"))
    for _ in range(iters):
        contrib = edges.join(r, edges["src"] == r["node"]).select(
            F.col("dst").alias("cnode"), F.expr("r div d").alias("c")
        )
        s = contrib.groupBy("cnode").agg(F.sum("c").alias("s"))
        r = deg.join(s, deg["node"] == s["cnode"], "left").select(
            "node",
            "d",
            (
                F.lit(base) + F.expr(f"({num} * coalesce(s, 0)) div {den}")
            ).alias("r"),
        )
    return r


def triangle_stats(pairs: DataFrame) -> DataFrame:
    """Global triangle/wedge/edge/node counts over an undirected pair
    list, via degree-oriented wedge closure (q89 docstring has the full
    scale argument: orientation bounds out-degree by O(sqrt(m)), so hub
    nodes cannot square). Returns a single-row DataFrame
    [n_nodes, n_edges, n_wedges, n_triangles]."""
    pairs = pairs.persist()
    deg = (
        pairs.select(F.col("p1").alias("node"))
        .unionAll(pairs.select(F.col("p2").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    da = deg.withColumnRenamed("node", "p1").withColumnRenamed("d", "d1")
    db = deg.withColumnRenamed("node", "p2").withColumnRenamed("d", "d2")
    o = (
        pairs.join(da, "p1")
        .join(db, "p2")
        .select(
            F.when(F.col("d1") <= F.col("d2"), F.col("p1"))
            .otherwise(F.col("p2"))
            .alias("src"),
            F.when(F.col("d1") <= F.col("d2"), F.col("p2"))
            .otherwise(F.col("p1"))
            .alias("dst"),
            F.when(F.col("d1") <= F.col("d2"), F.col("d2"))
            .otherwise(F.col("d1"))
            .alias("dd"),
        )
        .persist()
    )
    wa, wb = o.alias("wa"), o.alias("wb")
    wedges = wa.join(
        wb,
        (F.col("wa.src") == F.col("wb.src"))
        & (
            (F.col("wa.dd") < F.col("wb.dd"))
            | (
                (F.col("wa.dd") == F.col("wb.dd"))
                & (F.col("wa.dst") < F.col("wb.dst"))
            )
        ),
    ).select(F.col("wa.dst").alias("v1"), F.col("wb.dst").alias("v2"))
    closes = wedges.join(
        o, (wedges["v1"] == o["src"]) & (wedges["v2"] == o["dst"])
    )
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    n_edges = pairs.agg(F.count("*").alias("n_edges"))
    n_wedges = wedges.agg(F.count("*").alias("n_wedges"))
    n_tri = closes.agg(F.count("*").alias("n_triangles"))
    return (
        n_nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(n_wedges))
        .crossJoin(F.broadcast(n_tri))
    )
