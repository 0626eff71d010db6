"""Mention extraction (SURVEY.md F1-F3 Catalyst path + N5/N6 model path).

Two extraction paths, both emitting the MENTIONS relation:

1. ``regex_entities`` — pure Catalyst ``regexp_extract_all`` triple
   (reference: src/preprocessing/data_cleaner.py:70-79), zero Python,
   whole-stage-codegen end-to-end. Used by the minimum end-to-end slice
   and DuckDB-oracle-checkable.

2. ``extract_mentions`` — the production KG path: one fused ``mapInPandas``
   pass per partition (tokenize -> batched model logits -> argmax -> BIO
   repair N1-N3 -> IOB2 validate -> span decode N6 -> mention rows).
   Fused deliberately: one Arrow crossing instead of four chained pandas
   UDFs; the per-stage UDFs in kgforge.bio exist for unit-level parity
   tests. At 100 TB this stage is embarrassingly parallel (no shuffle) —
   partition count alone controls scale-out.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.bio import decode_spans, fix_entity_tags, validate_sentence
from kgforge.clean import PHONE_PAT, PRICE_PAT, PRODUCT_PAT, clean_text
from kgforge.ner_model import get_model
from kgforge.schemas import MENTIONS


def with_clean(df: DataFrame, text_col: str = "content") -> DataFrame:
    """content -> content_sha256 (per-row invariant) + clean_content."""
    return df.withColumn("content_sha256", F.sha2(F.col(text_col), 256)).withColumn(
        "clean_content", clean_text(F.col(text_col))
    )


def regex_entities(df: DataFrame, text_col: str = "clean_content") -> DataFrame:
    """F1-F3 + P6 — entity arrays and has_* flags, all Catalyst.

    Mirrors extract_entities (data_cleaner.py:70-79): group-1 price amounts,
    phone matches, trimmed group-2 product tails; has_* := len(list) > 0
    (data_cleaner.py:96-98).
    """
    c = F.col(text_col)
    out = (
        df.withColumn("prices", F.regexp_extract_all(c, F.lit(f"(?iU){PRICE_PAT}"), 1))
        .withColumn("phones", F.regexp_extract_all(c, F.lit(PHONE_PAT), 1))
        .withColumn(
            "products",
            F.transform(
                F.regexp_extract_all(c, F.lit(f"(?iU){PRODUCT_PAT}"), 2), F.trim
            ),
        )
    )
    return (
        out.withColumn("has_product", F.size("products") > 0)
        .withColumn("has_price", F.size("prices") > 0)
        .withColumn("has_phone", F.size("phones") > 0)
    )


def _mentions_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    model = get_model()
    token_lists = [str(t).split(" ") if t else [] for t in pdf["clean_content"]]
    tag_lists = model.predict_tags(token_lists)
    rows: list[tuple] = []
    for repo, path, commit, tokens, raw_tags in zip(
        pdf["repo"].values,
        pdf["path"].values,
        pdf["commit"].values,
        token_lists,
        tag_lists,
    ):
        tags = fix_entity_tags(tokens, raw_tags)
        if not validate_sentence(tokens, tags):
            continue
        for etype, start, end, surface in decode_spans(tokens, tags):
            rows.append((repo, path, commit, etype, surface, start, end, 1.0))
    return pd.DataFrame(rows, columns=[f.name for f in MENTIONS.fields])


def extract_mentions(df: DataFrame) -> DataFrame:
    """Cleaned source_files -> MENTIONS, one fused vectorized pass."""
    cols = ["repo", "path", "commit", "clean_content"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _mentions_batch(pdf)
            if len(out):
                yield out

    return df.select(*cols).mapInPandas(run, schema=MENTIONS)


def with_norm_surface(mentions: DataFrame) -> DataFrame:
    """Normalized surface for linking/canonical keys: lower + ws-normalize."""
    return mentions.withColumn(
        "norm_surface",
        F.trim(F.regexp_replace(F.lower(F.col("surface")), r"\s+", " ")),
    )
