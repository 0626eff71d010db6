"""Registry spine shared by every query module: the ``Q`` record, the
``REGISTRY`` dict, the ``@q`` decorator, the table loader, and the
cross-engine exact-arithmetic helpers (see package __init__ docstring)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

@dataclass
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None -> driver runs rows-only check


REGISTRY: dict[str, Q] = {}

# Bench-only queries: registered here instead of REGISTRY so they keep
# their benchmark role (bench.py's SimHash md5-vs-xxhash64 A/B legs) and
# stay callable WITHOUT occupying a driver correctness-rotation slot. The
# registry is capped at 96 (4 pinned + 2 rounds x 46 rotating under the
# driver's ~50-row snapshot, see rotation.py); r6 spends the slots these
# held on hash-gated graph queries instead (VERDICT r5 #3/#4) — a
# rows-only row for an xxhash64 twin whose md5 sibling is already
# hash-green (q41/q55 vs q24), or for the unsharded twin of an operator
# whose scale shape has its own gate (q46 vs q50), was rotation overhead.
DEMOTED: dict[str, Q] = {}


def q(name: str, sql: str | None, driver: bool = True):
    def deco(fn):
        (REGISTRY if driver else DEMOTED)[name] = Q(fn, sql)
        return fn

    return deco


def t(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Table loader. ``spread=True`` round-robin-repartitions the scan to
    the session's default parallelism — used by the CPU-bound-per-row
    queries (hashing/shingling/regex over documents/events/embeddings).

    Why (r7, guide §2.5 'input skew — one huge unsplittable file ...
    repartition immediately after the read'): the testdata tables are
    single parquet files with single-digit row-group counts, and a row
    group is the parallelism quantum of a parquet scan — documents.parquet
    at sf1.0 is ONE row group, so every expression in the scan stage ran
    on ONE core of 32 (measured: q24 21.6s single-task vs ~1s of work at
    full width). The repartition is a few MB of shuffle that buys full
    fan-out of the expensive projection. Scale note: this is input-layout
    repair, not local-mode tuning — a 100 TB table laid out in many
    multi-row-group files gets its scan parallelism from the splits
    themselves, and the round-robin exchange of a CPU-bound stage stays
    cheap relative to the per-row work it spreads."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if spread:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def _dec_sum(col, scale: int = 2):
    """Exact, order-insensitive SUM of a fixed-point double column -> double.

    The testdata money/quantity columns are exact <=2-decimal values, so the
    decimal cast is lossless in both engines and the sum is exact — immune
    to float accumulation-order differences across engines/parallelism.
    """
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def _exact_stddev(col, scale: int = 2):
    """Sample stddev via exact decimal sums (closed form) — deterministic
    across engines, unlike streaming stddev accumulators."""
    d = col.cast(f"decimal(18,{scale})")
    n = F.count(col).cast("double")
    sx = F.sum(d).cast("double")
    sxx = F.sum(d * d).cast("double")
    return F.when(
        n > 1,
        F.sqrt(F.greatest(F.lit(0.0), (sxx - sx * sx / n) / (n - F.lit(1.0)))),
    ).otherwise(F.lit(None))

