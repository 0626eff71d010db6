"""Synthetic corpus: sha256 per-row invariant + parallelism determinism."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kgforge.synth import synth_rows, synth_source_files, with_sha256

N = 200


def test_sha256_invariant(spark):
    """sha2(content, 256) == hashlib.sha256 for EVERY row (BASELINE.md gate;
    telegram_scraper.py:151-155 semantics)."""
    df = with_sha256(synth_source_files(spark, N))
    rows = df.select("content", "content_sha256").collect()
    assert len(rows) == N
    for r in rows:
        assert r.content_sha256 == hashlib.sha256(r.content.encode()).hexdigest()


def test_spark_matches_python_twin(spark):
    spark_rows = {
        (r.repo, r.path, r.commit, r.lang, r.content)
        for r in synth_source_files(spark, N).collect()
    }
    py_rows = {
        (d["repo"], d["path"], d["commit"], d["lang"], d["content"])
        for d in synth_rows(N)
    }
    assert spark_rows == py_rows


def test_partitioning_invariance(spark):
    """Corpus content is identical regardless of partition count."""
    a = sorted(r.content for r in synth_source_files(spark, N, partitions=2).collect())
    b = sorted(r.content for r in synth_source_files(spark, N, partitions=16).collect())
    assert a == b


def test_skew_fixture(spark):
    """Mega-repos hold ~30% of rows (skew fixture for salting tests)."""
    df = synth_source_files(spark, 1000)
    mega = df.filter(F.col("repo").startswith("megacorp/")).count()
    assert 250 <= mega <= 350
