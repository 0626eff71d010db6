"""Structured Streaming: incremental extract w/ checkpoint resume; stateful op."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgforge.streaming import running_repo_counts, stream_extract
from kgforge.synth import synth_source_files


def test_incremental_extract_with_checkpoint(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1 arrives
    synth_source_files(spark, 60).write.mode("append").parquet(input_dir)
    stream_extract(spark, input_dir, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # re-run with NO new data: checkpoint must make it a no-op (resume token)
    stream_extract(spark, input_dir, out, ckpt)
    assert spark.read.parquet(out).count() == n1

    # batch 2 arrives; only the delta is processed
    synth_source_files(spark, 60, partitions=2).withColumn(
        "path", F.concat(F.lit("late/"), F.col("path"))
    ).write.mode("append").parquet(input_dir)
    stream_extract(spark, input_dir, out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n2 > n1

    # incremental result == batch-from-scratch result
    from kgforge.extract import extract_mentions, with_clean

    batch = extract_mentions(with_clean(spark.read.parquet(input_dir)))
    assert n2 == batch.count()


def test_stateful_running_counts(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt2")
    synth_source_files(spark, 40).write.mode("append").parquet(input_dir)
    running_repo_counts(spark, input_dir, ckpt, "kgforge_test_counts")
    res = {
        r.repo: r.n_files
        for r in spark.table("kgforge_test_counts").collect()
    }
    truth = {
        r.repo: r.n
        for r in synth_source_files(spark, 40)
        .groupBy("repo")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # update-mode memory sink keeps the latest row per repo
    for repo, n in truth.items():
        assert res[repo] == n


def test_watermarked_window_agg(spark, tmp_path):
    """Event-time tumbling window + watermark over a file stream (late-data
    handling): update-mode results must match the batch windowed agg."""
    input_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt3")
    events = spark.range(0, 500).select(
        (F.lit(1_700_000_000) + F.col("id") * 3600).cast("timestamp").alias("ts"),
        (F.col("id") % 5).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    events.write.mode("overwrite").parquet(input_dir)

    sdf = spark.readStream.schema(events.schema).parquet(input_dir)
    agg = (
        sdf.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 day").alias("w"), "k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("day"), "k", "n", "sv"
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("kgforge_test_win")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.day, r.k): (r.n, r.sv)
        for r in spark.table("kgforge_test_win").collect()
    }
    want = {
        (r.day, r.k): (r.n, r.sv)
        for r in events.groupBy(
            F.window("ts", "1 day").alias("w"), "k"
        )
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("day"), "k", "n", "sv"
        )
        .collect()
    }
    assert got == want


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate content arriving in-stream is emitted once; state stays
    bounded by the watermark (dropDuplicatesWithinWatermark)."""
    from kgforge.streaming import stream_dedup_ingest
    from kgforge.synth import synth_source_files

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = synth_source_files(spark, 60)
    dupes = base.limit(20).withColumn("path", F.concat(F.col("path"), F.lit("")))
    # same content under the same key columns -> duplicate sha256 rows
    base.unionByName(dupes).write.mode("overwrite").parquet(input_dir)

    stream_dedup_ingest(spark, input_dir, out_dir, ckpt)
    out = spark.read.parquet(out_dir)
    n_distinct = base.select(F.sha2("content", 256)).distinct().count()
    assert out.count() == n_distinct
    assert out.select("content_sha256").distinct().count() == n_distinct
