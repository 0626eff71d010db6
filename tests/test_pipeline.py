"""End-to-end pipeline: triples, lineage, kill/resume byte-identity."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from kgforge import lineage as lin
from kgforge.pipeline import (
    KGPaths,
    STAGE_MENTIONS,
    run_extraction,
    run_graph,
    run_kg,
)
from kgforge.schemas import PRED_DECLARES, PRED_HAS_ATTR
from kgforge.synth import synth_source_files

N = 250
PARTS = 8


@pytest.fixture()
def outdir(tmp_path):
    return str(tmp_path / "kg")


def _paths(outdir):
    return KGPaths(
        mentions=f"{outdir}/mentions",
        triples=f"{outdir}/triples",
        lineage=f"{outdir}/lineage",
    )


def _triple_set(df):
    return {(r.subj, r.pred, r.obj) for r in df.select("subj", "pred", "obj").collect()}


def test_full_pipeline_shapes(spark, outdir):
    triples = run_kg(spark, synth_source_files(spark, N), outdir, n_parts=PARTS)
    preds = {r.pred for r in triples.select("pred").distinct().collect()}
    assert preds == {PRED_DECLARES, PRED_HAS_ATTR}
    # dedup: (subj,pred,obj) unique
    total = triples.count()
    assert triples.select("subj", "pred", "obj").distinct().count() == total
    # lineage rows exist for both stages and every partition
    ldf = spark.read.parquet(f"{outdir}/lineage")
    stages = {r.stage for r in ldf.select("stage").distinct().collect()}
    assert stages == {"mentions", "triples", "graph_input"}
    assert ldf.filter(F.col("stage") == "mentions").count() == PARTS


def test_resume_is_byte_identical(spark, outdir, tmp_path):
    """Kill-after-k-partitions resume (north rule): a run over only part of
    the input, resumed over the rest, must equal a clean full run —
    fingerprints and triple sets both."""
    src = synth_source_files(spark, N)
    paths = _paths(outdir)

    # simulated partial run: only partitions 0-2 worth of input survive the
    # "kill" (we filter the input; lineage marks those partitions done)
    from kgforge.materialize import with_part_id
    from kgforge.extract import with_clean

    partial = with_part_id(with_clean(src), ["repo", "path"], PARTS).filter(
        F.col("part_id") < 3
    ).select("repo", "path", "commit", "lang", "content")
    run_extraction(spark, partial, paths, n_parts=PARTS, resume=True)
    done = lin.completed_parts(spark, paths.lineage, STAGE_MENTIONS)
    assert done.count() == 3

    # resume with the FULL input: anti-join must skip the 3 done partitions
    run_extraction(spark, src, paths, n_parts=PARTS, resume=True)
    assert lin.completed_parts(spark, paths.lineage, STAGE_MENTIONS).count() == PARTS
    resumed = run_graph(spark, paths, n_parts=PARTS)

    # clean reference run
    clean_dir = str(tmp_path / "clean")
    reference = run_kg(spark, src, clean_dir, n_parts=PARTS)

    assert _triple_set(resumed) == _triple_set(reference)
    fp_a = {
        (r.stage, r.part_id, r.n_rows, r.fingerprint)
        for r in spark.read.parquet(f"{outdir}/lineage").collect()
    }
    fp_b = {
        (r.stage, r.part_id, r.n_rows, r.fingerprint)
        for r in spark.read.parquet(f"{clean_dir}/lineage").collect()
    }
    assert fp_a == fp_b


def test_rerun_extraction_is_idempotent(spark, outdir):
    src = synth_source_files(spark, 120)
    paths = _paths(outdir)
    run_extraction(spark, src, paths, n_parts=PARTS)
    before = spark.read.parquet(paths.mentions).count()
    # second run: everything committed -> no new partitions, no duplication
    run_extraction(spark, src, paths, n_parts=PARTS)
    after = spark.read.parquet(paths.mentions).count()
    assert before == after
    ldf = spark.read.parquet(paths.lineage).filter(F.col("stage") == "mentions")
    assert ldf.groupBy("part_id").count().filter(F.col("count") > 1).count() == 0


def test_parallelism_determinism_of_triples(spark, outdir, tmp_path):
    """Same triples at different shuffle widths (8-vs-32-core stand-in)."""
    src = synth_source_files(spark, 150, partitions=3)
    a = run_kg(spark, src, outdir, n_parts=4)
    src2 = synth_source_files(spark, 150, partitions=13)
    b = run_kg(spark, src2, str(tmp_path / "b"), n_parts=4)
    assert _triple_set(a) == _triple_set(b)


def test_graph_phase_short_circuits_when_input_unchanged(spark, outdir):
    src = synth_source_files(spark, 100)
    run_kg(spark, src, outdir, n_parts=4)
    ldf = spark.read.parquet(f"{outdir}/lineage")
    n_before = ldf.filter(F.col("stage") == "triples").count()
    # identical rerun: extraction anti-joins to nothing, graph phase must
    # short-circuit on the graph_input fingerprint marker
    triples = run_kg(spark, src, outdir, n_parts=4)
    ldf2 = spark.read.parquet(f"{outdir}/lineage")
    assert ldf2.filter(F.col("stage") == "triples").count() == n_before
    assert triples.count() > 0


def _parquet_content_hashes(path: str) -> dict[str, list[str]]:
    """{partition_dir: sorted sha256 of each parquet file's bytes} — file
    NAMES carry a per-job UUID, so identity is asserted on contents."""
    import hashlib
    import os

    out: dict[str, list[str]] = {}
    for root, _dirs, files in os.walk(path):
        rel = os.path.relpath(root, path)
        hs = [
            hashlib.sha256(open(os.path.join(root, f), "rb").read()).hexdigest()
            for f in files
            if f.endswith(".parquet")
        ]
        if hs:
            out[rel] = sorted(hs)
    return out


def test_upsert_partitioned_merge_semantics(spark, tmp_path):
    """MERGE at the materialize seam (VERDICT r4 #7): matched keys update
    (resolver applied), unmatched insert, everything else survives."""
    from kgforge.materialize import upsert_partitioned

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("a", "p", "x", "r9"), ("b", "p", "y", "r5"), ("c", "p", "z", "r7")],
        "subj string, pred string, obj string, repo string",
    )
    upsert_partitioned(base, path, ["subj", "pred", "obj"], n_parts=4)
    changes = spark.createDataFrame(
        [("b", "p", "y", "r2"), ("d", "p", "w", "r1")],
        "subj string, pred string, obj string, repo string",
    )
    upsert_partitioned(
        changes, path, ["subj", "pred", "obj"], n_parts=4,
        resolve={"repo": F.least},
    )
    rows = {
        (r.subj, r.obj): r.repo
        for r in spark.read.parquet(path).collect()
    }
    assert rows == {("a", "x"): "r9", ("b", "y"): "r2",
                    ("c", "z"): "r7", ("d", "w"): "r1"}


def test_upsert_same_changes_twice_is_byte_identical(spark, tmp_path):
    """Idempotency gate (VERDICT r4 #7 'done' criterion): re-merging the
    SAME change set leaves the table byte-identical — parquet contents
    compared file-by-file (sorted writes make layout deterministic)."""
    from kgforge.materialize import upsert_partitioned

    path = str(tmp_path / "tbl")
    base = synth_source_files(spark, 60).select(
        F.col("repo").alias("subj"), F.lit("p").alias("pred"),
        F.col("path").alias("obj"), F.col("commit").alias("repo"),
    )
    upsert_partitioned(base, path, ["subj", "pred", "obj"], n_parts=4)
    changes = base.limit(20).withColumn("repo", F.lit("zz"))
    upsert_partitioned(
        changes, path, ["subj", "pred", "obj"], n_parts=4,
        resolve={"repo": F.least},
    )
    first = _parquet_content_hashes(path)
    n_first = spark.read.parquet(path).count()
    upsert_partitioned(
        changes, path, ["subj", "pred", "obj"], n_parts=4,
        resolve={"repo": F.least},
    )
    assert _parquet_content_hashes(path) == first
    assert spark.read.parquet(path).count() == n_first


def test_cdc_incremental_batches_merge_exactly(spark, tmp_path):
    """Two source batches ingested incrementally (per-batch work dirs +
    one shared triple table via run_kg(upsert=True, triples_path=...)):
    the shared table must be EXACTLY the key-union of the two batches'
    independently-built triple tables, with least()-merged provenance on
    overlapping keys. (Deliberately NOT compared against a full rebuild:
    entity linking/canonicalization is corpus-global, so incremental
    batches canonicalize within-batch — the standard lambda tradeoff;
    a periodic full re-canonicalization run closes that gap. The MERGE
    itself must be exact, and that is what this pins.)"""
    src = synth_source_files(spark, 200)
    batch_a = src.filter(F.xxhash64("repo", "path") % 2 == 0)
    batch_b = src.filter(F.xxhash64("repo", "path") % 2 != 0)
    shared = str(tmp_path / "shared_triples")

    run_kg(spark, batch_a, str(tmp_path / "batch_a"), n_parts=PARTS,
           upsert=True, triples_path=shared)
    merged = run_kg(spark, batch_b, str(tmp_path / "batch_b"), n_parts=PARTS,
                    upsert=True, triples_path=shared)

    # reference: the same two batches built independently, merged in pandas
    ta = run_kg(spark, batch_a, str(tmp_path / "ref_a"), n_parts=PARTS)
    tb = run_kg(spark, batch_b, str(tmp_path / "ref_b"), n_parts=PARTS)
    expect = {(r.subj, r.pred, r.obj): r.repo for r in ta.collect()}
    for r in tb.collect():
        k = (r.subj, r.pred, r.obj)
        expect[k] = min(expect[k], r.repo) if k in expect else r.repo

    got = {(r.subj, r.pred, r.obj): r.repo for r in merged.collect()}
    assert got == expect
    assert _triple_set(merged) == _triple_set(ta) | _triple_set(tb)


def test_mention_id_audit_detects_collision(spark):
    import pytest
    from kgforge.pipeline import audit_mention_ids

    base = spark.createDataFrame(
        [
            ("r1", "a.py", "c1", "PRICE", "100", 0, 1, 11),
            ("r1", "b.py", "c1", "PRICE", "200", 0, 1, 22),
        ],
        "repo string, path string, commit string, entity_type string, "
        "surface string, start int, end int, mention_id long",
    )
    assert audit_mention_ids(base) == (2, 2)
    collided = base.withColumn("mention_id", F.lit(7).cast("long"))
    with pytest.raises(RuntimeError, match="collision"):
        audit_mention_ids(collided)


def test_entity_salience_deterministic_and_canonical(spark, outdir):
    """PageRank entity salience over the co-mention graph: two evaluations
    on the same mention table are row-identical (integer ranks, total
    tie-break order), every entity key is a canonical '<TYPE>:<surface>'
    form, and degrees are positive."""
    from kgforge.pipeline import entity_salience

    run_kg(spark, synth_source_files(spark, 150), outdir, n_parts=4)
    p = _paths(outdir)
    a = entity_salience(spark, p, n_top=20).collect()
    b = entity_salience(spark, p, n_top=20).collect()
    assert a == b
    assert 0 < len(a) <= 20
    ranks = [r.rank_scaled for r in a]
    assert ranks == sorted(ranks, reverse=True)
    for r in a:
        assert ":" in r.entity and r.degree >= 1 and r.rank_scaled > 0


def test_canon_map_artifact_and_salience_reuse(spark, outdir):
    """run_graph persists the canonicalization decision as <out>/canon_map;
    entity_salience reuses it when the mention fingerprint matches and
    falls back to rebuilding (identical result) when the artifact is
    missing."""
    import shutil

    from kgforge.pipeline import entity_salience

    run_kg(spark, synth_source_files(spark, 150), outdir, n_parts=4)
    cmap = spark.read.parquet(f"{outdir}/canon_map")
    assert set(cmap.columns) == {"entity_type", "norm_surface", "canon_surface"}
    assert cmap.count() > 0

    p = _paths(outdir)
    with_artifact = entity_salience(spark, p, n_top=15).collect()
    shutil.rmtree(f"{outdir}/canon_map")
    rebuilt = entity_salience(spark, p, n_top=15).collect()
    assert with_artifact == rebuilt


def test_related_entities_seed_resolution_and_determinism(spark, outdir):
    """Personalized-PageRank related entities (run_kg --related): seeds
    resolve through the canon_map (any alias of an entity works), the
    seed rows carry is_seed=True, every rank is a positive scaled
    integer with a total order, and two evaluations are row-identical.
    Non-seed neighbors must outrank distant nodes only via real teleport
    mass — with every seed unresolvable the result is empty, not
    uniform-PageRank fallback."""
    from kgforge.pipeline import entity_salience, related_entities

    run_kg(spark, synth_source_files(spark, 150), outdir, n_parts=4)
    p = _paths(outdir)
    # pick a real canonical entity from the salience ranking as the seed
    top = entity_salience(spark, p, n_top=1).collect()[0].entity
    a = related_entities(spark, p, seeds=[top], n_top=15).collect()
    b = related_entities(spark, p, seeds=[top], n_top=15).collect()
    assert a == b
    assert 0 < len(a) <= 15
    seeds = [r for r in a if r.is_seed]
    assert [r.entity for r in seeds] == [top]
    ranks = [r.rank_scaled for r in a]
    assert ranks == sorted(ranks, reverse=True) and min(ranks) >= 0
    # teleport mass concentrates on the seed: it must rank first
    assert a[0].entity == top
    # alias form resolves through canon_map normalization (upper + spaces)
    etype, surface = top.split(":", 1)
    alias = f"{etype}:  {surface.upper()}  "
    via_alias = related_entities(spark, p, seeds=[alias], n_top=15).collect()
    assert via_alias == a
    # unresolvable seed -> empty, never a silent uniform fallback
    none = related_entities(
        spark, p, seeds=["PRODUCT:does-not-exist-xyz"], n_top=15
    ).collect()
    assert none == []
