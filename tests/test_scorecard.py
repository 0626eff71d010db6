"""Vendor scorecard pipeline (reference §3.3) + alignment kernels (N5/N7/N8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgforge.alignment import align_labels, depad, pair_trim, whitespace_word_ids
from kgforge.schemas import TAG_TO_ID
from kgforge.scorecard import generate_scorecards, posts_with_mentions
from kgforge.synth import synth_messages


def test_scorecard_end_to_end(spark):
    posts = synth_messages(spark, 400)
    cards = generate_scorecards(posts).collect()
    by_channel = {r.channel: r for r in cards}
    assert len(by_channel) == 4  # 4 channels in the 0..399 id range
    for r in cards:
        assert 0.0 <= r.lending_score <= 100.0
        assert r.n_posts > 0
        assert r.top_post_id is not None
        # top post must be a real post of that vendor with max views
        top = (
            posts.filter(
                (F.col("channel") == r.channel)
                & (F.col("message_id") == r.top_post_id)
            )
            .select("views")
            .first()
        )
        mx = (
            posts.filter(F.col("channel") == r.channel)
            .agg(F.max("views"))
            .first()[0]
        )
        assert top.views == mx


def test_scorecard_price_stats_use_extracted_mentions(spark):
    posts = synth_messages(spark, 300)
    mentions = posts_with_mentions(posts)
    types = {r.entity_type for r in mentions.select("entity_type").distinct().collect()}
    assert "PRICE" in types and "PRODUCT" in types
    cards = {r.channel: r for r in generate_scorecards(posts).collect()}
    for r in cards.values():
        if r.avg_price is not None:
            assert r.min_price <= r.avg_price <= r.max_price


def test_scorecard_deterministic(spark):
    a = {r.channel: r.lending_score for r in generate_scorecards(synth_messages(spark, 200)).collect()}
    b = {r.channel: r.lending_score for r in generate_scorecards(synth_messages(spark, 200)).collect()}
    assert a == b


# --- alignment kernels (N5/N7/N8, train_ner.py:252-318 semantics) ---------


def test_align_labels_first_subword_gets_label():
    tags = ["O", "B-PRICE", "I-PRICE"]
    word_ids = [None, 0, 1, 2, None]
    out = align_labels(word_ids, tags)
    assert out == [-100, TAG_TO_ID["O"], TAG_TO_ID["B-PRICE"], TAG_TO_ID["I-PRICE"], -100]


def test_align_labels_continuation_subwords():
    tags = ["B-PRODUCT", "O"]
    # word 0 split into 3 subwords, word 1 into 2
    word_ids = [None, 0, 0, 0, 1, 1, None]
    out = align_labels(word_ids, tags)
    assert out == [
        -100,
        TAG_TO_ID["B-PRODUCT"],
        TAG_TO_ID["I-PRODUCT"],  # B- word continuation -> I-
        TAG_TO_ID["I-PRODUCT"],
        TAG_TO_ID["O"],
        -100,  # O continuation -> ignored
        -100,
    ]


def test_align_labels_out_of_range_word():
    # tokenization mismatch -> -100 (train_ner.py:275-281)
    assert align_labels([None, 0, 5], ["O"]) == [-100, TAG_TO_ID["O"], -100]


def test_depad_and_pair_trim():
    labels = [-100, TAG_TO_ID["B-PRICE"], TAG_TO_ID["O"], -100]
    preds = [TAG_TO_ID["O"], TAG_TO_ID["B-PRICE"], TAG_TO_ID["B-LOC"], TAG_TO_ID["O"]]
    pred_tags, true_tags = depad(preds, labels)
    assert true_tags == ["B-PRICE", "O"]
    assert pred_tags == ["B-PRICE", "B-LOC"]
    assert pair_trim([1, 2, 3], [4, 5]) == ([1, 2], [4, 5])


def test_word_ids_roundtrip_with_alignment():
    tokens = ["ሽያጭ", "verylongtoken", "ብር"]
    tags = ["O", "B-PRODUCT", "O"]
    wids = whitespace_word_ids(tokens)
    out = align_labels(wids, tags)
    # long token split in two: second piece gets I-PRODUCT
    assert TAG_TO_ID["I-PRODUCT"] in out
