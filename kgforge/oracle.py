"""FROZEN reference extractor — the P/R >= 0.95 gate oracle.

A deliberately *independent* pure-Python reimplementation of the reference
pipeline's observable semantics (clean -> tag -> repair -> validate ->
decode), written directly from the reference source and never sharing code
with the Spark path in kgforge.clean / kgforge.bio / kgforge.extract. Tests
run both on the same synthetic corpus and require span-level P/R >= 0.95
(BASELINE.md target) — drift in Java-vs-Python regex translation, Arrow
marshalling, or rule order shows up here.

Reference citations:
- clean_text: src/preprocessing/data_cleaner.py:52-68
- repair rules (order-sensitive): src/preprocessing/data_pipeline.py:101-136
- IOB2 validation: src/preprocessing/data_pipeline.py:169-188
- span grouping: HF aggregation_strategy='simple'
  (ethiomart_fintech/vendor_analytics/scorecard_engine.py:20-30)

DO NOT refactor this module to reuse kgforge.bio — duplication is the point.
"""

from __future__ import annotations

import re

from kgforge.ner_model import tag_tokens  # the stand-in network IS the model under test's weights

_PRICE_RE = re.compile(
    r"(\d{1,3}(?:,\d{3})*(?:\.\d+)?)\s*(ብር|birr|br|ዶላር|dollar)", re.IGNORECASE
)
_URL_RE = re.compile(r"https?://\S+|www\.\S+")
_CHARSET_RE = re.compile("[^\\w\\s\\u1200-\\u137F.,!?]")
_SKU_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9/-]{2,}$")


def py_clean_text(text: str | None) -> str:
    if text is None or text == "[no text]":
        return ""
    text = _PRICE_RE.sub(r"\1 ብር", text)
    text = _URL_RE.sub("", text)
    text = _CHARSET_RE.sub("", text)
    return " ".join(text.split()).strip()


def _fix(tokens: list[str], tags: list[str]) -> list[str]:
    new_tags = list(tags)
    i = 0
    while i < len(tokens):
        if new_tags[i].startswith(("B-PRICE", "I-PRICE")):
            if (
                i + 1 < len(tokens)
                and tokens[i + 1] in ("ብር", "birr", "br")
                and new_tags[i + 1] == "O"
            ):
                new_tags[i + 1] = "I-PRICE"
            i += 2
        else:
            i += 1
    for j, token in enumerate(tokens):
        if new_tags[j].startswith(("B-PRODUCT", "I-PRODUCT")) and _SKU_RE.match(token):
            new_tags[j] = "O"
    current = None
    for j, tag in enumerate(new_tags):
        if tag.startswith("B-"):
            current = tag[2:]
        elif tag.startswith("I-"):
            if current != tag[2:]:
                new_tags[j] = "B-" + tag[2:]
                current = tag[2:]
        else:
            current = None
    return new_tags


def _valid(tokens: list[str], tags: list[str]) -> bool:
    if len(tokens) != len(tags):
        return False
    prev = None
    for tag in tags:
        if tag.startswith("I-") and (not prev or prev[2:] != tag[2:]):
            return False
        if tag.startswith("B-") and prev and prev.startswith("I-"):
            return False
        prev = tag
    return True


def _decode(tokens: list[str], tags: list[str]):
    spans = []
    start = etype = None
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
            start = etype = None
    if start is not None:
        spans.append((etype, start, len(tags), " ".join(tokens[start:])))
    return spans


def reference_mentions(content: str) -> list[tuple]:
    """All (entity_type, start, end, surface) mentions for one content row."""
    clean = py_clean_text(content)
    tokens = clean.split(" ") if clean else []
    raw = tag_tokens(tokens)
    fixed = _fix(tokens, raw)
    if not _valid(tokens, fixed):
        return []
    return _decode(tokens, fixed)


def reference_mentions_for_rows(rows: list[dict]) -> set[tuple]:
    """Golden span set keyed like the Spark MENTIONS relation."""
    golden = set()
    for r in rows:
        for etype, start, end, surface in reference_mentions(r["content"]):
            golden.add((r["repo"], r["path"], r["commit"], etype, start, end, surface))
    return golden


def span_prf(golden: set, predicted: set) -> tuple[float, float, float]:
    """seqeval-style exact span match P/R/F1 (train_ner.py:305-343 shape)."""
    tp = len(golden & predicted)
    p = tp / len(predicted) if predicted else 1.0
    r = tp / len(golden) if golden else 1.0
    f = 2 * p * r / (p + r) if (p + r) else 0.0
    return p, r, f
