"""Partitioned triple-table materialize (north rule: final deduplicated graph).

Parquet stands in for Iceberg in the sandbox (same layout discipline:
partition column + dynamic partition overwrite == Iceberg's
overwrite-by-partition snapshot commit). Dynamic overwrite keeps
per-partition writes idempotent — re-running a partition replaces exactly
that partition, which is what makes kill/resume byte-stable.

The table format is ONE config seam (``TABLE_FORMAT`` /
KGFORGE_TABLE_FORMAT): with the Iceberg runtime jar + catalog configured
on a real cluster, setting it to ``iceberg`` routes every write through
``writeTo(...).overwritePartitions()``, whose snapshot commit gives
atomicity, time travel, schema evolution, and hidden-partition pruning —
the semantics the parquet path emulates with directory-level dynamic
overwrite. Mapping:

  parquet stand-in                      Iceberg
  ------------------------------------  -----------------------------------
  partitionBy(part_col) directory tree  PARTITIONED BY (part_col)
  partitionOverwriteMode=dynamic        overwritePartitions() snapshot
  lineage fingerprint rows              snapshot summary / manifest stats
  read-back with part_id filter         hidden partition pruning
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PARTS = 64

# "parquet" (sandbox default) or "iceberg" (real cluster w/ catalog).
TABLE_FORMAT = os.environ.get("KGFORGE_TABLE_FORMAT", "parquet")


def with_part_id(df: DataFrame, key_cols: list[str], n_parts: int = DEFAULT_PARTS) -> DataFrame:
    """Deterministic partition id: pmod(xxhash64(keys), n).

    Hashing (repo, path) rather than repo alone is the mega-repo salting
    strategy (FIXTURES.md skew fixture): a repo holding 30% of all rows
    spreads uniformly instead of pinning one straggler task.
    """
    return df.withColumn(
        "part_id",
        F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_parts)).cast("int"),
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    part_col: str = "part_id",
    coalesce_parts: bool = True,
    table_format: str | None = None,
) -> None:
    """Dynamic-partition-overwrite write: only touched partitions replaced.

    ``coalesce_parts`` repartitions by the partition column first so each
    task writes exactly one directory — without it, every task opens a
    writer per partition value (T x P small files; observed 2048 files for
    a 64-partition table, with write-time disk contention and slow
    read-back listing). One shuffle of the compact output table buys
    file-per-partition layout — the same discipline an Iceberg table with
    a sorted write distribution gives.
    """
    if coalesce_parts:
        df = df.repartition(F.col(part_col))
    fmt = table_format if table_format is not None else TABLE_FORMAT
    if fmt == "iceberg":
        # `path` is a catalog table identifier in Iceberg mode (needs the
        # iceberg-spark-runtime jar + a catalog — not present in this
        # sandbox; call shape is pinned by tests/test_io.py with a stub).
        # Existence is checked EXPLICITLY: a bare try/except around
        # overwritePartitions() would turn any transient commit failure
        # into a createOrReplace that wipes every untouched partition,
        # violating the idempotent per-partition resume contract (ADVICE
        # r2). Real write failures propagate.
        if df.sparkSession.catalog.tableExists(path):
            df.writeTo(path).overwritePartitions()
        else:
            df.writeTo(path).partitionedBy(F.col(part_col)).create()
        return
    (
        df.write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy(part_col)
        .parquet(path)
    )
