"""Structured Streaming ingest (SURVEY.md S1/§2.10 analogue).

The reference's scraper is an incremental micro-batch source in spirit —
paged pulls with rate limiting and a resume token (reference:
src/data_ingestion/telegram_scraper.py:278,:323,:96-130). kgforge maps it
to Structured Streaming: a file source over the source_files table,
`trigger(availableNow=True)` for batch-incremental runs, and the stream
checkpoint directory playing the resume-token role — a killed/re-run job
picks up exactly the unprocessed files.

Also a custom stateful operator (applyInPandasWithState): running per-repo
entity counts across micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.extract import extract_mentions, with_clean
from kgforge.schemas import SOURCE_FILES


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> None:
    """Incrementally extract mentions from newly-arrived source_files
    parquet; exactly-once via the stream checkpoint (resume-token
    semantics). Returns after draining available input (availableNow)."""
    sdf = (
        spark.readStream.schema(SOURCE_FILES)
        .option("maxFilesPerTrigger", 8)  # paged ingest, scraper-style
        .parquet(input_dir)
    )
    mentions = extract_mentions(with_clean(sdf))
    q = (
        mentions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    delay: str = "2 hours",
) -> None:
    """Streaming exact dedup for continuous corpus ingest (the training-
    data pipeline's arrival-time dedup): duplicate content arriving within
    the watermark window is emitted once, keyed by sha2(content) —
    ``dropDuplicatesWithinWatermark`` keeps state bounded (keys older than
    the watermark are evicted), unlike an unbounded dropDuplicates whose
    state grows with the corpus. Re-run with the same checkpoint resumes
    exactly-once.

    The watermark delay MUST exceed the event-time disorder of the feed:
    the synthetic event_ts below is spread over 3600s while micro-batches
    arrive in hash (not time) order, so a delay shorter than the spread
    would drop UNIQUE late rows as late data, not just duplicates (ADVICE
    r2). Default 2h > the 1h synthetic spread; a real feed sets this to its
    max arrival lag."""
    sdf = (
        spark.readStream.schema(SOURCE_FILES)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    # event time = a deterministic per-row timestamp derived from the key
    # columns (the synth corpus has no arrival column; a real feed uses its
    # ingest timestamp here)
    with_ts = sdf.withColumn(
        "event_ts",
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.pmod(F.xxhash64("repo", "path"), F.lit(3600))
        ),
    ).withColumn("content_sha256", F.sha2("content", 256))
    deduped = with_ts.withWatermark("event_ts", delay).dropDuplicatesWithinWatermark(
        ["content_sha256"]
    )
    q = (
        deduped.select("repo", "path", "content_sha256", "event_ts")
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def running_repo_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str,
) -> None:
    """Custom stateful streaming op: running mention-bearing-file count per
    repo via applyInPandasWithState (complete running totals across
    micro-batches, not per-batch counts)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    sdf = (
        spark.readStream.schema(SOURCE_FILES)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    out_schema = StructType(
        [
            StructField("repo", StringType(), False),
            StructField("n_files", LongType(), False),
        ]
    )
    state_schema = StructType([StructField("n", LongType(), False)])

    def update(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        import pandas as pd

        yield pd.DataFrame({"repo": [key[0]], "n_files": [n]})

    counts = sdf.groupBy("repo").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        counts.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
