"""Labeled-data preparation pipeline (reference §3.2 shape, Spark-first).

Mirrors prepare_labeled_data (reference: src/preprocessing/
data_pipeline.py:214-258): repair tags (N1-N3) -> validate (P4/P5, invalid
sentences dropped) -> seeded 80/20 split -> quality report. The split uses
Spark's randomSplit(seed=42): a DIFFERENT RNG than sklearn's
train_test_split (SURVEY.md §7.4 risk 6) — golden tests pin OUR split, and
it is deterministic for a fixed DataFrame partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.bio import repair_tags_udf, valid_sentence_udf


def prepare_labeled_data(
    sentences: DataFrame, seed: int = 42, val_fraction: float = 0.2
) -> tuple[DataFrame, DataFrame, dict]:
    """sentences(sent_id, tokens, tags) -> (train, val, quality_report)."""
    fixed = sentences.withColumn(
        "tags", repair_tags_udf(F.col("tokens"), F.col("tags"))
    )
    valid = fixed.filter(valid_sentence_udf(F.col("tokens"), F.col("tags")))
    # repartition by sent_id first so randomSplit is stable across input
    # partitionings (randomSplit is per-partition deterministic)
    valid = valid.repartition(8, "sent_id").sortWithinPartitions("sent_id")
    train, val = valid.randomSplit([1 - val_fraction, val_fraction], seed=seed)
    report = quality_report(train, val)
    return train, val, report


def tag_distribution(sentences: DataFrame) -> DataFrame:
    """A1 — Counter(tag) over the corpus (data_pipeline.py:264-265)."""
    return (
        sentences.select(F.explode("tags").alias("tag"))
        .groupBy("tag")
        .agg(F.count("*").alias("n"))
    )


def entity_consistency(sentences: DataFrame) -> DataFrame:
    """A2 — per entity type: total B- starts and 'properly terminated'
    count, where terminated means the next tag is not I-/B- continuation
    (data_pipeline.py:267-283 semantics, expressed with posexplode + lead
    lookup via the tag array itself — no self-join needed)."""
    pos = sentences.select(
        F.col("sent_id"),
        F.posexplode("tags").alias("pos", "tag"),
        F.col("tags"),
    )
    b_rows = pos.filter(F.col("tag").startswith("B-"))
    next_tag = F.try_element_at(F.col("tags"), F.col("pos") + 2)  # 1-based +1; null past end
    terminated = F.when(
        next_tag.isNull()
        | ~(next_tag.startswith("I-") | next_tag.startswith("B-")),
        1,
    ).otherwise(0)
    return (
        b_rows.select(
            F.substring("tag", 3, 100).alias("entity_type"),
            terminated.alias("terminated"),
        )
        .groupBy("entity_type")
        .agg(
            F.count("*").alias("total"),
            F.sum("terminated").alias("correct"),
        )
    )


def corpus_stats(sentences: DataFrame) -> DataFrame:
    """A3 — counts, min/max/avg sentence length (data_pipeline.py:288-294)."""
    return sentences.agg(
        F.count("*").alias("n_sentences"),
        F.min(F.size("tokens")).alias("min_len"),
        F.max(F.size("tokens")).alias("max_len"),
        F.round(F.avg(F.size("tokens")), 4).alias("avg_len"),
    )


def quality_report(train: DataFrame, val: DataFrame) -> dict:
    """The reference's data_quality_report.json shape
    (data_pipeline.py:260-297) as a plain dict of small aggregates."""
    both = train.unionByName(val)
    tags = {r.tag: r.n for r in tag_distribution(both).collect()}
    ents = {
        r.entity_type: {"total": r.total, "correct": r.correct}
        for r in entity_consistency(both).collect()
    }
    return {
        "tag_distribution": tags,
        "entity_consistency": ents,
        "split_counts": {"train": train.count(), "val": val.count()},
    }
