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


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Q(fn, sql)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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

