"""Catalyst clean chain vs frozen Python twin (Java/Python regex fidelity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgforge.clean import clean_text, nfkc_normalize
from kgforge.oracle import py_clean_text
from kgforge.synth import synth_source_files

EDGE_CASES = [
    None,
    "",
    "[no text]",
    "ዋጋ 2,500.50 ብር ነው",
    "price: 1,000 birr and 30 br and 5 dollar",
    "check https://example.com/x?a=1 and www.foo.bar/z now",
    "emoji 🔥🔥 mix ሽያጭ ጫማ!",
    "ﬁnal oﬀer №1",
    "  lots   of \t whitespace \n here ",
    "phone 0911223344 end",
    "at start 9123456789",
    "symbols @#$%^&*() kept .,!? only",
]


def test_clean_matches_python_twin_on_corpus(spark):
    df = synth_source_files(spark, 300).withColumn(
        "clean", clean_text(F.col("content"))
    )
    for r in df.select("content", "clean").collect():
        assert r.clean == py_clean_text(r.content), r.content


def test_clean_edge_cases(spark):
    df = spark.createDataFrame([(t,) for t in EDGE_CASES], "text string")
    out = df.withColumn("clean", clean_text(F.col("text"))).collect()
    for r in out:
        assert r.clean == py_clean_text(r.text), repr(r.text)


def test_price_normalization(spark):
    df = spark.createDataFrame([("item 1,500 birr",)], "text string")
    r = df.select(clean_text(F.col("text")).alias("c")).first()
    assert r.c == "item 1,500 ብር"


def test_nfkc_udf(spark):
    df = spark.createDataFrame([("ﬁle №1 🔥 ok",)], "text string")
    r = df.select(nfkc_normalize(F.col("text")).alias("n")).first()
    assert "file" in r.n  # NFKC decomposed the ligature
    assert "[EMOJI]" in r.n
