"""Banded embedding LSH: bucket determinism + hot-bucket salting bounds.

VERDICT r1 "What's wrong" #4: the embedding near-dup path must not let
within-bucket candidate pairs grow ~n^2/buckets — banding adds selectivity
(AND-of-r bits) and salting bounds the worst case (identical vectors, which
no LSH can spread, are capped per salt group like kgforge.link hot blocks).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kgforge import vectorops


def _const_vecs(spark, n: int, dim: int = 64):
    """n identical embeddings — the adversarial hot bucket."""
    vec = F.array(*[F.lit(0.1 * ((d % 7) - 3)) for d in range(dim)])
    return spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def test_identical_vectors_share_all_band_buckets(spark):
    df = vectorops.with_band_buckets(_const_vecs(spark, 5))
    per_band = df.groupBy("band").agg(F.countDistinct("bucket").alias("k")).collect()
    assert len(per_band) == vectorops.EMB_BANDS
    assert all(r["k"] == 1 for r in per_band)


def test_salting_bounds_hot_bucket_pairs(spark):
    n, max_block = 600, 100
    docs = _const_vecs(spark, n)
    pairs = vectorops.embedding_candidate_pairs(docs, max_block=max_block)
    got = pairs.count()
    # unsalted would be C(600,2) = 179,700 pairs; salting into ~n/max_block
    # groups caps it near bands-independent ~ (n/max_block) * C(max_block,2)
    assert 0 < got <= 45_000, got


def test_candidate_pairs_deterministic(spark):
    docs = _const_vecs(spark, 200).withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda x: x + (F.col("vec_id") % 3).cast("double") / 10.0,
        ),
    )
    a = vectorops.embedding_candidate_pairs(docs, max_block=50)
    ids1 = sorted((r["a_id"], r["b_id"]) for r in a.collect())
    ids2 = sorted((r["a_id"], r["b_id"]) for r in a.collect())
    assert ids1 == ids2 and ids1


def test_ivf_topk_probes_find_query_and_overlap_bruteforce(spark):
    """IVF search on the real embeddings table: the query vector's own cell
    is always probe #1 (so the query itself is rank 1 with cos 1.0), and
    the nprobe=4/16 result overlaps brute-force top-10 substantially."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    qvec = list(e.filter(F.col("vec_id") == 0).first()["embedding"])
    ivf = vectorops.ivf_topk(e, qvec, k=10, n_centroids=16, nprobe=4).collect()
    assert ivf[0]["vec_id"] == 0 and ivf[0]["cos_sim"] == 1.0
    bf = {r["vec_id"] for r in vectorops.topk_cosine(e, qvec, 10).collect()}
    assert len({r["vec_id"] for r in ivf} & bf) >= 4


def test_ivf_assignment_is_total_and_deterministic(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cent = vectorops.ivf_centroids(e, 16)
    assert cent.count() == 16
    a1 = vectorops.ivf_assign(e, cent)
    n = e.count()
    assert a1.count() == n  # every vector lands in exactly one cell
    m1 = dict((r["vec_id"], r["c_id"]) for r in a1.collect())
    m2 = dict((r["vec_id"], r["c_id"]) for r in vectorops.ivf_assign(e, cent).collect())
    assert m1 == m2


def test_kmeans_partitions_all_vectors_deterministically(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = e.count()
    a = vectorops.kmeans_fixed(e, k=8, iters=2)
    rows = a.collect()
    assert len(rows) == n  # total partition of the corpus
    sizes = (
        vectorops.kmeans_fixed(e, k=8, iters=2).groupBy("c_id").count().collect()
    )
    assert 2 <= len(sizes) <= 8
    # deterministic across reruns and parallelism
    b = {r["vec_id"]: r["c_id"] for r in vectorops.kmeans_fixed(
        e.repartition(13), k=8, iters=2).collect()}
    assert {r["vec_id"]: r["c_id"] for r in rows} == b


def test_bucket_width_scales_with_rows_param(spark):
    """More rows/bits -> strictly finer partitioning on random-ish data."""
    e = spark.range(400).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.hash(F.col("id") * 64 + d) % 1000).cast("double") / 1000.0 - 0.5
                for d in range(64)
            ]
        ).alias("embedding"),
    )
    coarse = (
        vectorops.with_band_buckets(e, bands=1, rows=4)
        .groupBy("bucket").count().count()
    )
    fine = (
        vectorops.with_band_buckets(e, bands=1, rows=10)
        .groupBy("bucket").count().count()
    )
    assert fine > coarse


# ---------------------------------------------------------------------------
# Multi-probe LSH (VERDICT r2 next-round #8)
# ---------------------------------------------------------------------------


def _twin_vecs(spark, n_base: int = 30, dim: int = 64, noise: float = 0.35):
    """n_base vectors + one noisy twin each (ids i and 1000+i): the twins
    are the ground-truth near-dup pairs. Deterministic (seeded rng)."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(n_base, dim))
    rows = []
    truth = []
    for i in range(n_base):
        v = base[i]
        w = v + noise * rng.normal(size=dim)
        cos = float(v @ w / (np.linalg.norm(v) * np.linalg.norm(w)))
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i, [float(x) for x in w]))
        if cos >= 0.85:
            truth.append((i, 1000 + i))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, set(truth)


def test_probe_bucket_flips_exactly_one_bit(spark):
    """Per (vector, band): probe = exact bucket with exactly ONE bit
    flipped (the lowest-|margin| sign test)."""
    df, _ = _twin_vecs(spark, n_base=10)
    pair = vectorops.band_bucket_probe_pair(F.col("embedding"), band=0)
    got = df.select(
        F.bit_count(
            pair["bucket"].bitwiseXOR(pair["probe"]).cast("long")
        ).alias("nbits")
    ).collect()
    assert got and all(r.nbits == 1 for r in got)


def test_multiprobe_recall_superset_of_exact(spark):
    """Multi-probe candidates strictly contain the exact-bucket candidates
    and recall the ground-truth twins at least as well; on this noisy
    fixture the probed variant must catch >= 90% of true pairs."""
    df, truth = _twin_vecs(spark)
    assert len(truth) >= 20  # fixture sanity: enough true near-dups

    def cands(multiprobe: bool) -> set:
        p = vectorops.embedding_candidate_pairs(df, multiprobe=multiprobe)
        return {(r.a_id, r.b_id) for r in p.select("a_id", "b_id").collect()}

    exact, probed = cands(False), cands(True)
    assert exact <= probed
    rec_exact = len(truth & exact) / len(truth)
    rec_probed = len(truth & probed) / len(truth)
    assert rec_probed >= rec_exact
    assert rec_probed >= 0.9, (rec_exact, rec_probed)
