"""End-to-end KG construction job (north rule orchestration).

Two phases, mirroring where resume matters at 10^12-file scale:

Phase 1 — **extraction** (embarrassingly parallel, no shuffle, resumable
per partition): source_files -> clean -> batched mention extraction ->
mention table partitioned by pmod(xxhash64(repo, path), N) with lineage
rows. A killed run resumes via left_anti against committed lineage; every
step is deterministic so the resumed table is fingerprint-identical.

Phase 2 — **graph** (global): mention linking (MinHash-LSH blocks +
token-sort scoring) -> iterative connected components -> canonical
surfaces -> (subj, pred, obj) triples -> global dedup -> partitioned
materialize + graph lineage.

Entry point for spark-submit: ``python -m kgforge.jobs.run_kg``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge import canon, link, lineage, materialize
from kgforge.extract import extract_mentions, with_clean, with_norm_surface
from kgforge.triples import mentions_to_triples

STAGE_MENTIONS = "mentions"
STAGE_TRIPLES = "triples"

MENTION_CONTENT_COLS = [
    "repo", "path", "commit", "entity_type", "surface", "start", "end",
]
TRIPLE_CONTENT_COLS = ["subj", "pred", "obj"]


@dataclass
class KGPaths:
    mentions: str
    triples: str
    lineage: str


def mention_id_expr() -> F.Column:
    """Deterministic mention id (never monotonically_increasing_id — must be
    identical at any parallelism, SURVEY.md §7.4 risk 5).

    64-bit, so the birthday bound bites around ~4.3e9 distinct mentions
    (ADVICE r1). Kept 64-bit deliberately — the id is the CC vertex / join
    key and doubling its width doubles every graph-phase shuffle — but
    guarded: ``audit_mention_ids`` verifies distinct(content) ==
    distinct(id) on every committed partition set and aborts on collision;
    at >1e9-mention scale, partition the graph phase by entity_type (ids
    only need uniqueness within a CC domain) before reaching the bound.
    """
    return F.xxhash64("repo", "path", "commit", "entity_type", "surface", "start", "end")


def audit_mention_ids(mentions: DataFrame) -> tuple[int, int]:
    """Collision audit (ADVICE r1): #distinct content tuples must equal
    #distinct mention_ids. Two hash-agg passes, no driver data transfer;
    raises on any silent id merge."""
    row = mentions.agg(
        F.count_distinct(F.struct(*MENTION_CONTENT_COLS)).alias("n_tuples"),
        F.count_distinct(F.col("mention_id")).alias("n_ids"),
    ).first()
    if row["n_tuples"] != row["n_ids"]:
        raise RuntimeError(
            f"mention_id collision: {row['n_tuples']} distinct content "
            f"tuples -> {row['n_ids']} distinct ids"
        )
    return row["n_tuples"], row["n_ids"]


def run_extraction(
    spark: SparkSession,
    source_files: DataFrame,
    paths: KGPaths,
    n_parts: int = materialize.DEFAULT_PARTS,
    resume: bool = True,
) -> None:
    """Phase 1: source_files -> partitioned mention table + lineage."""
    t0 = time.time()
    files = materialize.with_part_id(
        with_clean(source_files), ["repo", "path"], n_parts
    )
    if resume:
        done = lineage.completed_parts(spark, paths.lineage, STAGE_MENTIONS)
        files = lineage.filter_pending(files, done)
    # Partition universe BEFORE extraction: a partition with zero mentions
    # still gets a lineage row (FIXTURES.md §6 edge case). Collected once —
    # it is at most n_parts ints — and reused for partition-pruned read-back.
    part_ids = [
        r.part_id for r in files.select("part_id").distinct().collect()
    ]
    if not part_ids:
        return  # everything already committed

    mentions = extract_mentions(files)
    mentions = materialize.with_part_id(mentions, ["repo", "path"], n_parts)
    mentions = with_norm_surface(mentions).withColumn("mention_id", mention_id_expr())

    materialize.write_partitioned(mentions, paths.mentions)

    # read back ONLY the partitions this run wrote (partition pruning on the
    # part_id directory column — no full-table scan on resume)
    written = spark.read.parquet(paths.mentions).filter(
        F.col("part_id").isin(part_ids)
    )
    # r7 (guide §2.6 "overlap independent jobs"): the id-collision audit
    # and the per-partition lineage aggregation are independent scans of
    # the same committed parquet — run them as two concurrent jobs so the
    # tail of one back-fills the other's idle cores (wall = max, not sum;
    # each was ~2.5s at the 400k-file bench). Ordering contract preserved:
    # lineage rows are only MATERIALIZED here; the append below still
    # happens after the audit result is in, so a collision abort can never
    # leave committed lineage behind.
    from concurrent.futures import ThreadPoolExecutor

    rows = lineage.lineage_rows(
        written, STAGE_MENTIONS, MENTION_CONTENT_COLS
    ).persist()
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_audit = pool.submit(audit_mention_ids, written)
        f_rows = pool.submit(rows.count)
        f_rows.result()
        f_audit.result()  # raises on collision BEFORE any lineage append
    # zero-mention partitions: emit count-0 rows via anti-join
    universe = spark.createDataFrame(
        [(int(p),) for p in part_ids], "part_id int"
    )
    empty = (
        universe.join(rows.select("part_id"), "part_id", "left_anti")
        .select(
            F.lit(STAGE_MENTIONS).alias("stage"),
            F.col("part_id").cast("int"),
            F.lit(0).cast("long").alias("n_rows"),
            F.lit("0" * 16).alias("fingerprint"),
            F.lit(int(t0 * 1000)).alias("wall_ms"),
        )
    )
    lineage.append_lineage(rows.unionByName(empty), paths.lineage)
    rows.unpersist()


STAGE_GRAPH_INPUT = "graph_input"


def _mentions_fingerprint(spark: SparkSession, paths: KGPaths) -> str:
    """Identity of the graph phase's input: sha256 over the sorted
    (part_id, fingerprint) pairs of committed mention partitions
    (<= n_parts rows — a driver-side collect is the cheap path)."""
    import hashlib

    rows = (
        spark.read.parquet(paths.lineage)
        .filter(F.col("stage") == STAGE_MENTIONS)
        .select("part_id", "fingerprint")
        .collect()
    )
    blob = ";".join(f"{r.part_id}:{r.fingerprint}" for r in sorted(rows))
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _canon_map_path(paths: KGPaths) -> str:
    """The canon-map artifact lives beside the mention table (the batch's
    work dir), since it is derived from exactly that mention state."""
    return paths.mentions.rstrip("/").rsplit("/", 1)[0] + "/canon_map"


def build_canon_map(
    mentions: DataFrame, link_threshold: float = link.DEFAULT_THRESHOLD
) -> DataFrame:
    """Distinct surface forms -> canonical surface, via typed MinHash-LSH
    linking + connected components. Shared by run_graph (triple
    canonicalization) and entity_salience (graph vertex identity), so both
    agree on entity boundaries. Runs over DISTINCT (entity_type,
    norm_surface) — see run_graph's scale note."""
    # r7: persist the distinct-surface relation — it is referenced by the
    # linker (numeric + textual branches), the CC active/isolated split,
    # and canonical_surfaces (members + canon), so without the cache the
    # full mention-table aggregation re-ran up to ~5x per graph build
    # (guide §5 "worth it when a DataFrame is reused"). Small by
    # construction (distinct (type, surface) forms, not mentions).
    surfaces = (
        mentions.groupBy("entity_type", "norm_surface")
        .agg(F.min("mention_id").alias("mention_id"))
        .select("mention_id", "entity_type", "norm_surface")
        .persist()
    )
    edges = link.typed_link_surfaces(surfaces, threshold=link_threshold)
    assign = canon.connected_components(surfaces.select("mention_id"), edges)
    return canon.canonical_surfaces(assign, surfaces).select(
        "entity_type", "norm_surface", "canon_surface"
    )


def entity_salience(
    spark: SparkSession,
    paths: KGPaths,
    iters: int = 4,
    n_top: int = 100,
    link_threshold: float = link.DEFAULT_THRESHOLD,
) -> DataFrame:
    """Canonical-entity salience: scaled-integer PageRank over the entity
    co-mention graph (kgforge/graph.py::pagerank_scaled).

    Vertices are canonical entities (post-linking, post-CC, the same
    canon_map the triple table uses); an undirected edge joins two entities
    mentioned in the same document. Deterministic: integer ranks, ties
    broken by entity key, so the ranking is bit-identical at any
    parallelism.

    Scale shape: the doc->entity edge build is one distinct + one
    co-partitioned self-equi-join on the doc key (bounded entities per
    document, so linear like q81's co-purchase build); PageRank is
    iters x (equi-join + partial-agg shuffle). Nothing driver-side but the
    node count.
    """
    from kgforge.graph import pagerank_scaled

    pairs, _ = _entity_comention_pairs(spark, paths, link_threshold)
    r = pagerank_scaled(pairs, iters=iters)
    return (
        r.select(
            F.col("node").alias("entity"),
            F.col("d").alias("degree"),
            F.col("r").alias("rank_scaled"),
        )
        .orderBy(F.col("rank_scaled").desc(), "entity")
        .limit(n_top)
    )


def _fresh_canon_map(spark, paths: KGPaths, link_threshold: float):
    """Reuse run_graph's committed canon_map when it was built from EXACTLY
    this mention-table state (same fingerprint discipline as the graph
    phase's resume short-circuit); otherwise rebuild. Avoids a second
    LSH + CC pass in the common run_kg --salience/--related flow."""
    try:
        lin = spark.read.parquet(paths.lineage)
        fresh = (
            lin.filter(
                (F.col("stage") == STAGE_GRAPH_INPUT)
                & (F.col("fingerprint") == _mentions_fingerprint(spark, paths))
            ).count()
            > 0
        )
        if fresh:
            return spark.read.parquet(_canon_map_path(paths))
    except Exception:
        pass
    return build_canon_map(
        spark.read.parquet(paths.mentions), link_threshold=link_threshold
    )


def _entity_comention_pairs(spark, paths: KGPaths, link_threshold: float):
    """(pairs, canon_map): distinct undirected co-mention edges between
    canonical entities — the shared graph both entity_salience (global
    PageRank) and related_entities (personalized PageRank) rank over.
    One distinct + one co-partitioned self-equi-join on the doc key
    (bounded entities per document, so linear like q81's co-purchase
    build)."""
    from kgforge.triples import entity_key

    mentions = spark.read.parquet(paths.mentions)
    canon_map = _fresh_canon_map(spark, paths, link_threshold)
    doc_ent = (
        mentions.join(canon_map, ["entity_type", "norm_surface"])
        .select(
            F.concat_ws("\x1f", "repo", "path", "commit").alias("doc"),
            entity_key(F.col("entity_type"), F.col("canon_surface")).alias(
                "entity"
            ),
        )
        .distinct()
    )
    a, b = doc_ent.alias("a"), doc_ent.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc") == F.col("b.doc"))
            & (F.col("a.entity") < F.col("b.entity")),
        )
        .select(F.col("a.entity").alias("p1"), F.col("b.entity").alias("p2"))
        .distinct()
    )
    return pairs, canon_map


def related_entities(
    spark: SparkSession,
    paths: KGPaths,
    seeds: list[str],
    iters: int = 4,
    n_top: int = 25,
    link_threshold: float = link.DEFAULT_THRESHOLD,
) -> DataFrame:
    """Seed-relative entity ranking: personalized PageRank over the same
    canonical co-mention graph entity_salience uses, with teleport mass
    returning to the SEED entities — "what is most related to these
    entities in this KG", the query a KG consumer actually asks
    (kgforge/graph.py::personalized_pagerank_scaled; driver-gated as q99).

    ``seeds`` are '<TYPE>:<surface>' strings. Each surface is normalized
    exactly like mention surfaces (lower + whitespace collapse) and
    resolved THROUGH the canon_map, so any alias of an entity works as a
    seed — the same entity-boundary decision the triple table made.
    Unresolvable seeds are ignored; no resolvable seed -> empty result.

    Returns [entity, degree, rank_scaled, is_seed], rank-descending with
    a total tie-break, deterministic at any parallelism (scaled-integer
    arithmetic end to end).
    """
    from kgforge.graph import personalized_pagerank_scaled
    from kgforge.triples import entity_key

    pairs, canon_map = _entity_comention_pairs(spark, paths, link_threshold)
    raw = spark.createDataFrame([(s,) for s in seeds], "raw string")
    parsed = raw.select(
        F.substring_index("raw", ":", 1).alias("entity_type"),
        F.trim(
            F.regexp_replace(
                F.lower(F.expr("substring(raw, instr(raw, ':') + 1)")),
                r"\s+",
                " ",
            )
        ).alias("norm_surface"),
    )
    seed_nodes = (
        parsed.join(canon_map, ["entity_type", "norm_surface"])
        .select(
            entity_key(F.col("entity_type"), F.col("canon_surface")).alias(
                "node"
            )
        )
        .distinct()
    )
    r = personalized_pagerank_scaled(pairs, seed_nodes, iters=iters)
    seed_marked = seed_nodes.withColumn("is_seed", F.lit(True))
    return (
        r.join(seed_marked, "node", "left")
        .select(
            F.col("node").alias("entity"),
            F.col("d").alias("degree"),
            F.col("r").alias("rank_scaled"),
            F.coalesce("is_seed", F.lit(False)).alias("is_seed"),
        )
        .orderBy(F.col("rank_scaled").desc(), "entity")
        .limit(n_top)
    )


def run_graph(
    spark: SparkSession,
    paths: KGPaths,
    n_parts: int = materialize.DEFAULT_PARTS,
    link_threshold: float = link.DEFAULT_THRESHOLD,
    resume: bool = True,
    upsert: bool = False,
) -> DataFrame:
    """Phase 2: mentions -> linked/canonicalized deduplicated triple table.

    Scale-critical design point: linking and connected components run over
    DISTINCT (entity_type, norm_surface) forms, never mention instances.
    A hot surface appearing in 10^9 mentions is one vertex, not 10^9 —
    identical-surface pairs would otherwise blow up quadratically (observed:
    8.7k mentions -> 1.6M edges before this collapse; ~2k after). Mentions
    re-attach to their canonical surface by an equi-join on the surface key
    at the end (AQE skew-join handles hot surface keys).
    """
    input_fp = _mentions_fingerprint(spark, paths)
    if resume:
        # short-circuit: if the graph was already built from EXACTLY this
        # mention-table state, the committed triple table is current.
        try:
            lin = spark.read.parquet(paths.lineage)
            done = (
                lin.filter(
                    (F.col("stage") == STAGE_GRAPH_INPUT)
                    & (F.col("fingerprint") == input_fp)
                ).count()
                > 0
            )
        except Exception:
            done = False
        if done:
            return spark.read.parquet(paths.triples)

    mentions = spark.read.parquet(paths.mentions)
    canon_map = build_canon_map(mentions, link_threshold=link_threshold)

    # The canonicalization decision is itself an artifact: persist it so
    # (a) entity resolution is auditable after the fact and (b) downstream
    # consumers (entity_salience) reuse it instead of re-running LSH + CC
    # over the full mention table — at 100 TB the linking pass dwarfs the
    # map's size (distinct surfaces only). Reading it back also means the
    # triple join consumes the committed artifact, not a recomputation.
    canon_map.write.mode("overwrite").parquet(_canon_map_path(paths))
    canon_map = spark.read.parquet(_canon_map_path(paths))

    canonical = mentions.join(canon_map, ["entity_type", "norm_surface"])
    triples = mentions_to_triples(canonical, surface_col="canon_surface")
    triples = materialize.with_part_id(triples, ["subj", "pred", "obj"], n_parts)

    if upsert:
        # CDC mode (VERDICT r4 #7): MERGE this batch's triples into an
        # existing triple table instead of overwriting it — incremental
        # ingestion of a new file batch. repo merges via least() so the
        # min-provenance invariant survives any batch arrival order and
        # re-merging the same batch is a no-op.
        materialize.upsert_partitioned(
            triples, paths.triples, ["subj", "pred", "obj"],
            n_parts=n_parts, resolve={"repo": F.least},
        )
    else:
        materialize.write_partitioned(triples, paths.triples)
    written = spark.read.parquet(paths.triples)
    rows = lineage.lineage_rows(written, STAGE_TRIPLES, TRIPLE_CONTENT_COLS)
    marker = rows.sparkSession.createDataFrame(
        [(STAGE_GRAPH_INPUT, -1, 0, input_fp, 0)],
        "stage string, part_id int, n_rows long, fingerprint string, wall_ms long",
    )
    lineage.append_lineage(rows.unionByName(marker), paths.lineage)
    return written


def run_kg(
    spark: SparkSession,
    source_files: DataFrame,
    out_dir: str,
    n_parts: int = materialize.DEFAULT_PARTS,
    resume: bool = True,
    upsert: bool = False,
    triples_path: str | None = None,
) -> DataFrame:
    """Full pipeline; returns the materialized triple table.

    CDC mode: ``upsert=True`` MERGEs this run's triples into the existing
    table instead of overwriting; ``triples_path`` points batches at a
    SHARED triple table while each batch keeps its own mentions/lineage
    under its ``out_dir`` (the incremental-ingestion layout: per-batch
    work dirs, one long-lived graph table)."""
    paths = KGPaths(
        mentions=f"{out_dir}/mentions",
        triples=triples_path or f"{out_dir}/triples",
        lineage=f"{out_dir}/lineage",
    )
    run_extraction(spark, source_files, paths, n_parts, resume)
    return run_graph(spark, paths, n_parts, resume=resume, upsert=upsert)
