"""BIO tag repair / validation / span decode (SURVEY.md N1-N7, P4-P5).

Pure-Python kernels define the semantics (pinned verbatim to the reference's
rule order — reference: src/preprocessing/data_pipeline.py:101-136 applies
rule 1 with an ``i += 2`` skip, then rule 2, then rule 3 sequentially; the
order is observable and the P/R gate depends on it). Spark wrappers apply
the kernels as vectorized pandas UDFs over ``array<string>`` columns —
Arrow batches, never per-row Python.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, BooleanType, IntegerType, StringType, StructField, StructType

from kgforge.schemas import TAGS

_SKU_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9/-]{2,}$")  # data_pipeline.py:59-61
PRICE_UNITS = ("ብር", "birr", "br")

# ---------------------------------------------------------------------------
# Pure-Python kernels (single source of truth; the frozen oracle calls these
# too, so tests pin rule-order fidelity once, here).
# ---------------------------------------------------------------------------


def fix_entity_tags(tokens: list[str], tags: list[str]) -> list[str]:
    """N1-N3 repair, exact reference order (data_pipeline.py:101-136).

    Rule 1 (price-unit absorption): a PRICE-tagged token followed by a bare
    unit token tagged O absorbs the unit as I-PRICE; scan skips 2.
    Rule 2 (SKU veto): PRODUCT-tagged token matching the SKU pattern -> O.
    Rule 3 (IOB2 enforcement): I-X without a live same-type entity -> B-X.
    """
    new_tags = list(tags)
    i = 0
    while i < len(tokens):
        if new_tags[i].startswith(("B-PRICE", "I-PRICE")):
            if (
                i + 1 < len(tokens)
                and tokens[i + 1] in PRICE_UNITS
                and new_tags[i + 1] == "O"
            ):
                new_tags[i + 1] = "I-PRICE"
            i += 2
        else:
            i += 1
    for j, token in enumerate(tokens):
        if new_tags[j].startswith(("B-PRODUCT", "I-PRODUCT")) and _SKU_RE.match(token):
            new_tags[j] = "O"
    current_entity = None
    for j, tag in enumerate(new_tags):
        if tag.startswith("B-"):
            current_entity = tag[2:]
        elif tag.startswith("I-"):
            if current_entity != tag[2:]:
                new_tags[j] = f"B-{tag[2:]}"
                current_entity = tag[2:]
        else:
            current_entity = None
    return new_tags


def validate_sentence(tokens: list[str], tags: list[str]) -> bool:
    """P4+P5 — length match + strict IOB2 (data_pipeline.py:169-188)."""
    if len(tokens) != len(tags):
        return False
    prev_tag: str | None = None
    for tag in tags:
        if tag.startswith("I-"):
            if not prev_tag or prev_tag[2:] != tag[2:]:
                return False
        elif tag.startswith("B-"):
            if prev_tag and prev_tag.startswith("I-"):
                return False
        prev_tag = tag
    return True


def clean_tag_vocab(tags: list[str], vocab: tuple[str, ...] = TAGS) -> list[str]:
    """N4 — unknown tag -> 'O' (train_ner.py:97-113 semantics)."""
    vocab_set = set(vocab)
    return [t if t in vocab_set else "O" for t in tags]


def decode_spans(tokens: list[str], tags: list[str]) -> list[tuple[str, int, int, str]]:
    """N6 — BIO span grouping, HF ``aggregation_strategy='simple'`` shape
    (scorecard_engine.py:20-30): contiguous B-X (I-X)* -> one mention.

    Returns (entity_type, start_token, end_token_exclusive, surface).
    """
    spans: list[tuple[str, int, int, str]] = []
    start = None
    etype = None
    for i, tag in enumerate(tags):
        if tag.startswith("B-"):
            if start is not None:
                spans.append((etype, start, i, " ".join(tokens[start:i])))
            start, etype = i, tag[2:]
        elif tag.startswith("I-") and start is not None and tag[2:] == etype:
            continue
        else:
            if start is not None:
                spans.append((etype, start, i, " ".join(tokens[start:i])))
                start, etype = None, None
    if start is not None:
        spans.append((etype, start, len(tags), " ".join(tokens[start:])))
    return spans


# ---------------------------------------------------------------------------
# Spark wrappers — vectorized pandas UDFs over array columns.
# ---------------------------------------------------------------------------

SPAN_STRUCT = ArrayType(
    StructType(
        [
            StructField("entity_type", StringType(), False),
            StructField("start", IntegerType(), False),
            StructField("end", IntegerType(), False),
            StructField("surface", StringType(), False),
        ]
    )
)


@pandas_udf(ArrayType(StringType()))
def repair_tags_udf(tokens: pd.Series, tags: pd.Series) -> pd.Series:
    return pd.Series(
        [fix_entity_tags(list(tk), list(tg)) for tk, tg in zip(tokens, tags)]
    )


@pandas_udf(BooleanType())
def valid_sentence_udf(tokens: pd.Series, tags: pd.Series) -> pd.Series:
    return pd.Series(
        [validate_sentence(list(tk), list(tg)) for tk, tg in zip(tokens, tags)]
    )


@pandas_udf(ArrayType(StringType()))
def clean_vocab_udf(tags: pd.Series) -> pd.Series:
    return pd.Series([clean_tag_vocab(list(tg)) for tg in tags])


@pandas_udf(SPAN_STRUCT)
def decode_spans_udf(tokens: pd.Series, tags: pd.Series) -> pd.Series:
    return pd.Series(
        [
            [
                {"entity_type": t, "start": s, "end": e, "surface": surf}
                for (t, s, e, surf) in decode_spans(list(tk), list(tg))
            ]
            for tk, tg in zip(tokens, tags)
        ]
    )


def iob2_valid_expr(tags: Column) -> Column:
    """P5 as a pure Catalyst expression (no Python): strict IOB2 check via
    zip-with-lag over the tag array. Equivalent to ``validate_sentence`` on
    equal-length rows; used where the plan should stay in codegen."""
    prev = F.concat(
        F.array(F.lit("")), F.slice(tags, 1, F.greatest(F.size(tags) - 1, F.lit(0)))
    )
    pairs = F.arrays_zip(tags.alias("t"), prev.alias("p"))
    bad = F.exists(
        pairs,
        lambda x: (
            x["t"].startswith("I-")
            & (
                x["p"].isNull()
                | (x["p"] == "")
                | (F.substring(x["p"], 3, 100) != F.substring(x["t"], 3, 100))
            )
        )
        | (x["t"].startswith("B-") & x["p"].startswith("I-")),
    )
    return F.when(F.size(tags) == 0, F.lit(True)).otherwise(~bad)
