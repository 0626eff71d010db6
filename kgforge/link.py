"""Entity linking: MinHash-LSH blocking + token-sort similarity (north rule).

Absent from the reference (SURVEY.md §2.6 'absent, required'); designed
Spark-first for 100 TB:

1. **Blocking** — DataFrame-native MinHash over character shingles of the
   normalized surface: ``b`` bands, each band's signature =
   min(xxhash64(band_id, shingle)). Mentions sharing (band, signature, type)
   land in one block -> candidate pairs come from a block-local self-join
   instead of the O(n^2) cross join.
2. **Hot-block control** — blocks larger than ``max_block`` are *salted*:
   deterministically split by a hash of mention_id so no single reduce task
   owns a mega-block (FIXTURES.md hot-surface fixture; AQE skew-join also
   on). Identical surfaces short-circuit through an exact-key block so
   salting never loses exact duplicates.
3. **Scoring** — token-sort-ratio (sorted-token Levenshtein ratio) as a
   vectorized pandas UDF over candidate pairs only.

Every step is deterministic (seeded hashes, no RNG) so resume/reruns are
byte-stable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

DEFAULT_BANDS = 4
DEFAULT_SHINGLE = 3
DEFAULT_THRESHOLD = 0.82
DEFAULT_MAX_BLOCK = 200


def _levenshtein_ratio(a: str, b: str) -> float:
    """Pure-Python ratio on sorted tokens (only runs on blocked pairs)."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != b[j - 1]))
        prev = cur
    return 1.0 - prev[lb] / max(la, lb)


def token_sort_ratio(a: str, b: str) -> float:
    sa = " ".join(sorted(a.split()))
    sb = " ".join(sorted(b.split()))
    return _levenshtein_ratio(sa, sb)


@pandas_udf(DoubleType())
def token_sort_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([token_sort_ratio(x or "", y or "") for x, y in zip(a, b)])


def _shingles(col, k: int):
    """char k-shingles of a padded surface as an array column (Catalyst)."""
    padded = F.concat(F.lit("^"), col, F.lit("$"))
    n = F.greatest(F.length(padded) - (k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: padded.substr(i, F.lit(k)))


def minhash_blocks(
    mentions: DataFrame,
    bands: int = DEFAULT_BANDS,
    shingle: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """(mention_id, entity_type, norm_surface) -> one row per (band, sig)."""
    sh = _shingles(F.col("norm_surface"), shingle)
    df = mentions.withColumn("_sh", sh)
    bands_arr = F.array(*[F.lit(i) for i in range(bands)])
    df = df.withColumn("band", F.explode(bands_arr))
    sig = F.array_min(
        F.transform(
            F.col("_sh"), lambda s: F.xxhash64(F.col("band"), s)
        )
    )
    return df.select(
        "mention_id", "entity_type", "norm_surface", "band", sig.alias("sig")
    )


def candidate_pairs(
    mentions: DataFrame,
    bands: int = DEFAULT_BANDS,
    shingle: int = DEFAULT_SHINGLE,
    max_block: int = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Blocked candidate pairs (src < dst), deduplicated across bands.

    Hot blocks (> max_block members) are salted: members are split into
    ceil(n/max_block) deterministic sub-blocks by xxhash64(mention_id); this
    trades a sliver of recall inside pathological blocks for bounded task
    size — exact-duplicate surfaces are separately paired via an exact-key
    block so they are never lost.
    """
    blocks = minhash_blocks(mentions, bands, shingle)

    counts = blocks.groupBy("entity_type", "band", "sig").agg(
        F.count("*").alias("_n")
    )
    blocks = blocks.join(F.broadcast(counts.filter(F.col("_n") > 1)),
                         ["entity_type", "band", "sig"])
    salt = F.when(
        F.col("_n") > max_block,
        F.pmod(F.xxhash64("mention_id"), (F.col("_n") / max_block + 1).cast("int")),
    ).otherwise(F.lit(0))
    blocks = blocks.withColumn("salt", salt)

    left = blocks.select(
        "entity_type", "band", "sig", "salt",
        F.col("mention_id").alias("src"), F.col("norm_surface").alias("surf_a"),
    )
    right = blocks.select(
        "entity_type", "band", "sig", "salt",
        F.col("mention_id").alias("dst"), F.col("norm_surface").alias("surf_b"),
    )
    pairs = left.join(right, ["entity_type", "band", "sig", "salt"]).filter(
        F.col("src") < F.col("dst")
    )

    # Exact-duplicate fast path: same (type, surface) always pairs, immune to
    # band/salt splits.
    exact = (
        mentions.alias("a")
        .join(
            mentions.alias("b"),
            (F.col("a.entity_type") == F.col("b.entity_type"))
            & (F.col("a.norm_surface") == F.col("b.norm_surface"))
            & (F.col("a.mention_id") < F.col("b.mention_id")),
        )
        .select(
            F.col("a.mention_id").alias("src"),
            F.col("b.mention_id").alias("dst"),
            F.col("a.norm_surface").alias("surf_a"),
            F.col("b.norm_surface").alias("surf_b"),
        )
    )

    return (
        pairs.select("src", "dst", "surf_a", "surf_b")
        .unionByName(exact)
        .dropDuplicates(["src", "dst"])
    )


def score_edges(pairs: DataFrame, threshold: float = DEFAULT_THRESHOLD) -> DataFrame:
    """Candidate pairs -> similarity edges above threshold (EDGES schema)."""
    scored = pairs.withColumn(
        "sim", token_sort_ratio_udf(F.col("surf_a"), F.col("surf_b"))
    )
    return scored.filter(F.col("sim") >= threshold).select("src", "dst", "sim")


def link_mentions(
    mentions_keyed: DataFrame,
    bands: int = DEFAULT_BANDS,
    shingle: int = DEFAULT_SHINGLE,
    threshold: float = DEFAULT_THRESHOLD,
    max_block: int = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """MENTIONS_KEYED -> EDGES."""
    pairs = candidate_pairs(
        mentions_keyed.select("mention_id", "entity_type", "norm_surface"),
        bands,
        shingle,
        max_block,
    )
    return score_edges(pairs, threshold)
