"""CoNLL text scan/sink (SURVEY.md S4/S9) — Spark-first.

The reference parses CoNLL five separate times with Python file loops
(reference: src/preprocessing/data_pipeline.py:138-167 and four variants).
kgforge reads it ONCE as a distributed text scan and reconstructs sentences
relationally: sentence id = running count of blank lines (window cumulative
sum), then collect tokens/tags per sentence ordered by line number.

Scale note: the per-file window is one ordering per file — fine for
corpus-sized CoNLL (the reference's corpus is 3k sentences); at scale the
input is sharded files and each file is one task (wholetext read). This
scan is eval interop only, never the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """CoNLL file(s) -> (sent_id, file, file_sent_id, tokens, tags).

    Mirrors the reference reader's semantics: delimiter = tab if present
    else whitespace, maxsplit 1 (data_pipeline.py:146-160); malformed lines
    (fewer than 2 fields) are skipped (P7, train_ner.py:144-150).

    Line order is EXPLICIT: each file is read whole (``wholetext``) and
    split with ``posexplode``, so line_no is the true in-file position —
    not monotonically_increasing_id, whose partition-index ordering is an
    undocumented contract when one file spans several splits (ADVICE r1).
    One row per file bounds memory by the largest file; shard giant CoNLL
    exports upstream (this scan is eval interop, not the 100 TB path).

    ``sent_id`` is GLOBALLY unique across a multi-file glob —
    xxhash64(file, in-file index) — so downstream span joins
    (metrics.span_prf on (sent_id, entity_type, start, end)) never
    conflate sentences from different files that share an in-file index
    (ADVICE r1). ``file_sent_id`` keeps the human-readable 0..n index.
    """
    files = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value")
    )
    # Split on \r\n, bare \r, or \n: the reference's actual exports are CRLF
    # (Windows-side Telegram dumps), and F.trim strips only spaces — with a
    # plain "\n" split every blank line would survive as "\r" (sentence
    # boundaries lost) and every tag would keep a trailing "\r" (ADVICE r2).
    lines = files.select(
        "file",
        F.posexplode(F.split("value", r"\r\n|\r|\n")).alias("line_no", "raw"),
    ).select("file", "line_no", F.trim(F.col("raw")).alias("line"))
    w = Window.partitionBy("file").orderBy("line_no")
    with_sent = lines.withColumn(
        "file_sent_id",
        F.sum(F.when(F.col("line") == "", 1).otherwise(0)).over(w),
    ).filter(F.col("line") != "")
    parts = F.split(F.col("line"), r"\s+", 2)
    tokens_tags = with_sent.select(
        "file",
        "file_sent_id",
        "line_no",
        F.get(parts, 0).alias("token"),  # F.get: null (not ANSI error) when
        F.get(parts, 1).alias("tag"),  # a malformed line has <2 fields (P7)
    ).filter(F.col("tag").isNotNull() & (F.col("tag") != ""))
    grouped = (
        tokens_tags.groupBy("file", "file_sent_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("line_no", "token", "tag"))
                ),
                lambda s: s["token"],
            ).alias("tokens"),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("line_no", "token", "tag"))
                ),
                lambda s: s["tag"],
            ).alias("tags"),
        )
        .select(
            F.xxhash64("file", "file_sent_id").alias("sent_id"),
            "file",
            "file_sent_id",
            "tokens",
            "tags",
        )
    )
    return grouped


def write_conll(df: DataFrame, path: str) -> None:
    """(tokens, tags) -> CoNLL text, one Spark text write.

    The reference's temp-file + atomic rename (data_pipeline.py:190-211) is
    subsumed by Spark's task-commit protocol.
    """
    body = F.concat_ws(
        "\n",
        F.zip_with(
            F.col("tokens"), F.col("tags"), lambda t, g: F.concat_ws("\t", t, g)
        ),
    )
    df.select(F.concat(body, F.lit("\n")).alias("value")).write.mode(
        "overwrite"
    ).text(path)
