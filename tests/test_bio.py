"""BIO repair/validate/decode — per-rule goldens (SURVEY.md §7.4 risk 1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgforge.bio import (
    clean_tag_vocab,
    decode_spans,
    fix_entity_tags,
    iob2_valid_expr,
    repair_tags_udf,
    valid_sentence_udf,
    validate_sentence,
)


def test_rule1_price_unit_absorption():
    tokens = ["ዋጋ", "2,500", "ብር", "ነው"]
    tags = ["O", "B-PRICE", "O", "O"]
    assert fix_entity_tags(tokens, tags) == ["O", "B-PRICE", "I-PRICE", "O"]


def test_rule1_skip_semantics():
    # reference applies rule 1 with i += 2 after a PRICE hit
    # (data_pipeline.py:105-117): the unit token itself is skipped, so a
    # unit immediately followed by another bare unit is NOT re-absorbed.
    tokens = ["100", "ብር", "ብር"]
    tags = ["B-PRICE", "O", "O"]
    assert fix_entity_tags(tokens, tags) == ["B-PRICE", "I-PRICE", "O"]


def test_rule2_sku_veto():
    tokens = ["ሽያጭ", "SKU-123/A4"]
    tags = ["O", "B-PRODUCT"]
    assert fix_entity_tags(tokens, tags) == ["O", "O"]


def test_rule2_short_token_not_vetoed():
    # SKU pattern needs >= 3 chars after the first (data_pipeline.py:59-61)
    tokens = ["ሽያጭ", "ab"]
    tags = ["O", "B-PRODUCT"]
    assert fix_entity_tags(tokens, tags) == ["O", "B-PRODUCT"]


def test_rule3_orphan_i_promoted():
    tokens = ["x", "y"]
    tags = ["O", "I-PRICE"]
    assert fix_entity_tags(tokens, tags) == ["O", "B-PRICE"]


def test_rule3_type_switch():
    tokens = ["a", "b", "c"]
    tags = ["B-PRICE", "I-PRODUCT", "I-PRODUCT"]
    assert fix_entity_tags(tokens, tags) == ["B-PRICE", "B-PRODUCT", "I-PRODUCT"]


def test_rule_order_rule1_feeds_rule3():
    # rule 1 writes I-PRICE after B-PRICE; rule 3 must keep it intact
    tokens = ["1,000", "birr"]
    tags = ["B-PRICE", "O"]
    fixed = fix_entity_tags(tokens, tags)
    assert fixed == ["B-PRICE", "I-PRICE"]
    assert validate_sentence(tokens, fixed)


def test_validate_rejects():
    assert not validate_sentence(["a"], ["I-PRICE"])
    assert not validate_sentence(["a", "b"], ["B-PRICE"])  # length mismatch
    assert not validate_sentence(["a", "b"], ["B-PRICE", "I-LOC"])
    # reference rejects B- directly after I- (data_pipeline.py:181-183)
    assert not validate_sentence(
        ["a", "b", "c"], ["B-PRICE", "I-PRICE", "B-LOC"]
    )
    assert validate_sentence(["a", "b"], ["B-PRICE", "I-PRICE"])


def test_vocab_cleanup():
    assert clean_tag_vocab(["B-PRICE", "B-WEIRD", "O"]) == ["B-PRICE", "O", "O"]


def test_decode_spans():
    tokens = ["ዋጋ", "2,500", "ብር", "x", "ጫማ"]
    tags = ["O", "B-PRICE", "I-PRICE", "O", "B-PRODUCT"]
    assert decode_spans(tokens, tags) == [
        ("PRICE", 1, 3, "2,500 ብር"),
        ("PRODUCT", 4, 5, "ጫማ"),
    ]


def test_decode_adjacent_b_tags():
    tokens = ["a", "b"]
    tags = ["B-LOC", "B-LOC"]
    assert decode_spans(tokens, tags) == [("LOC", 0, 1, "a"), ("LOC", 1, 2, "b")]


def test_spark_udfs_match_kernels(spark):
    data = [
        (["ዋጋ", "2,500", "ብር"], ["O", "B-PRICE", "O"]),
        (["ab", "SKU-99/X2"], ["O", "B-PRODUCT"]),
        (["x"], ["I-LOC"]),
    ]
    df = spark.createDataFrame(data, "tokens array<string>, tags array<string>")
    out = df.select(
        "tokens",
        "tags",
        repair_tags_udf("tokens", "tags").alias("fixed"),
    ).withColumn("ok", valid_sentence_udf("tokens", F.col("fixed")))
    for r in out.collect():
        assert r.fixed == fix_entity_tags(r.tokens, r.tags)
        assert r.ok == validate_sentence(r.tokens, r.fixed)


def test_catalyst_iob2_expr_matches_python(spark):
    cases = [
        ["O", "B-PRICE", "I-PRICE"],
        ["I-PRICE"],
        ["B-PRICE", "I-LOC"],
        ["B-PRICE", "I-PRICE", "B-LOC"],
        ["O"],
        [],
        ["B-LOC", "B-LOC"],
    ]
    df = spark.createDataFrame([(c,) for c in cases], "tags array<string>")
    out = df.select("tags", iob2_valid_expr(F.col("tags")).alias("v")).collect()
    for r in out:
        assert r.v == validate_sentence(["t"] * len(r.tags), list(r.tags)), r.tags
