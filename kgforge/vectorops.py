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


def sign_lsh_bucket(vec: Column, dims: tuple[int, ...] = (1, 9, 17, 25, 33)) -> Column:
    """Random-hyperplane-style signature using fixed axis-aligned planes:
    bit i = sign(vec[dim_i]). Deterministic and oracle-checkable; on a real
    deployment the dims become seeded random hyperplanes (same plan shape).
    """
    bits = [
        F.when(F.element_at(vec, d).cast("double") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, d in enumerate(dims)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
