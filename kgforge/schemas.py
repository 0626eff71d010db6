"""Declared StructType schemas for every stage boundary.

The reference uses dynamic convention-based pandas schemas (columns appear by
assignment; defensive projection at telegram_scraper.py:399). kgforge pins a
fixed, declared schema at every boundary so plans are stable, Parquet/Iceberg
pushdown works, and the driver's schema checks are deterministic.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Primary KG input (BASELINE.json input_hint): Iceberg-style table of
# source-code repositories.
# ---------------------------------------------------------------------------
SOURCE_FILES = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
    ]
)

# source_files + derived cleaning/hash columns (data_cleaner.py:86-98 shape)
CLEANED_FILES = StructType(
    SOURCE_FILES.fields
    + [
        StructField("content_sha256", StringType(), False),
        StructField("clean_content", StringType(), False),
    ]
)

# CoNLL/BIO sentence corpus (data_pipeline.py:138-163 -> array columns)
SENTENCES = StructType(
    [
        StructField("sent_id", LongType(), False),
        StructField("repo", StringType(), True),
        StructField("path", StringType(), True),
        StructField("commit", StringType(), True),
        StructField("tokens", ArrayType(StringType(), False), False),
        StructField("tags", ArrayType(StringType(), False), False),
    ]
)

# Entity mention relation (HF pipeline output shape, scorecard_engine.py:54-57)
MENTIONS = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("entity_type", StringType(), False),
        StructField("surface", StringType(), False),
        StructField("start", IntegerType(), False),  # token index, inclusive
        StructField("end", IntegerType(), False),  # token index, exclusive
        StructField("score", DoubleType(), True),
    ]
)

# Mention with a stable id + normalized surface (linking input)
MENTIONS_KEYED = StructType(
    [
        StructField("mention_id", LongType(), False),
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("entity_type", StringType(), False),
        StructField("surface", StringType(), False),
        StructField("norm_surface", StringType(), False),
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
    ]
)

# Candidate / scored linking edges
EDGES = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("sim", DoubleType(), False),
    ]
)

# Connected-components assignment
COMPONENTS = StructType(
    [
        StructField("mention_id", LongType(), False),
        StructField("component_id", LongType(), False),
    ]
)

# The triple table (north rule: (subj, pred, obj) + provenance partition key)
TRIPLES = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("repo", StringType(), True),
        StructField("part_id", IntegerType(), False),
    ]
)

# Per-partition lineage/metrics row (idempotent resume + metrics, north rule).
# fingerprint = hex(bit_xor(xxhash64(row))) — order-insensitive, O(1) memory
# per partition (a sorted-list sha256 would need a per-partition collect; XOR
# folding scales to arbitrarily large partitions and is what the resume
# byte-identity test compares).
LINEAGE = StructType(
    [
        StructField("stage", StringType(), False),
        StructField("part_id", IntegerType(), False),
        StructField("n_rows", LongType(), False),
        StructField("fingerprint", StringType(), False),
        StructField("wall_ms", LongType(), False),
    ]
)

# BIO tag vocabulary — single source of truth (SURVEY.md section 7.4 risk 2:
# the reference ships three inconsistent label orders at train_ner.py:38,
# interpret.py:80-83 and models/fine_tuned/.../config.json; we pin ONE).
ENTITY_TYPES = ("PRODUCT", "PRICE", "LOC", "PHONE")
TAGS = ("O",) + tuple(
    f"{p}-{t}" for t in ENTITY_TYPES for p in ("B", "I")
)
TAG_TO_ID = {t: i for i, t in enumerate(TAGS)}
ID_TO_TAG = dict(enumerate(TAGS))

PRED_DECLARES = "declares_entity"
PRED_HAS_ATTR = "has_attribute"
