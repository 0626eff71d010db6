"""Subword/label alignment + de-padding (SURVEY.md N5/N7/N8).

Pure-function reimplementation of the reference's tokenizer-facing
semantics (reference: src/modeling/train_ner.py:252-303 alignment,
:305-318 de-padding; duplicated at compare_model.py:156-210). The HF
tokenizer itself is not in this sandbox; the semantics take the
``word_ids`` sequence as input (exactly what HF returns) so a real
tokenizer drops in unchanged. Unit-tested per SURVEY §2.4; at scale this
runs inside the batched-inference mapInPandas (kgforge.extract).
"""

from __future__ import annotations

from kgforge.schemas import ID_TO_TAG, TAG_TO_ID

IGNORE = -100


def align_labels(word_ids: list[int | None], tags: list[str]) -> list[int]:
    """N5 — word_ids -> per-subword label ids (train_ner.py:268-292):

    - special tokens (None) -> -100
    - first subword of a word -> that word's label id (out-of-range -> -100)
    - continuation subwords: B-X word -> I-X id; I-X word -> same id;
      O/other -> -100
    """
    label_ids: list[int] = []
    prev: int | None = None
    for widx in word_ids:
        if widx is None:
            label_ids.append(IGNORE)
        elif widx != prev:
            if 0 <= widx < len(tags):
                label_ids.append(TAG_TO_ID.get(tags[widx], TAG_TO_ID["O"]))
            else:
                label_ids.append(IGNORE)
        else:
            prev_tag = tags[prev] if (prev is not None and prev < len(tags)) else "O"
            if prev_tag.startswith("B-"):
                label_ids.append(TAG_TO_ID.get("I-" + prev_tag[2:], IGNORE))
            elif prev_tag.startswith("I-"):
                label_ids.append(TAG_TO_ID[prev_tag])
            else:
                label_ids.append(IGNORE)
        prev = widx
    return label_ids


def depad(predictions: list[int], labels: list[int]) -> tuple[list[str], list[str]]:
    """N7 — drop -100 positions, map ids->tags (train_ner.py:305-318)."""
    pred_tags = [
        ID_TO_TAG[p] for p, l in zip(predictions, labels) if l != IGNORE
    ]
    true_tags = [
        ID_TO_TAG[l] for p, l in zip(predictions, labels) if l != IGNORE
    ]
    return pred_tags, true_tags


def pair_trim(a: list, b: list) -> tuple[list, list]:
    """N8 — truncate both sequences to the common length
    (interpret.py:1040-1045)."""
    n = min(len(a), len(b))
    return a[:n], b[:n]


def whitespace_word_ids(tokens: list[str], max_len: int | None = None) -> list[int | None]:
    """A minimal word_ids generator for tests: [CLS] tok... [SEP] with one
    subword per word, splitting words longer than 6 chars into two subwords
    (deterministic stand-in for a real subword tokenizer)."""
    ids: list[int | None] = [None]
    for i, tok in enumerate(tokens):
        ids.append(i)
        if len(tok) > 6:
            ids.append(i)
    ids.append(None)
    if max_len is not None:
        ids = ids[:max_len]
    return ids


# ---------------------------------------------------------------------------
# Tokenized-training-rows production (train_ner.py:252-303 + :358-363)
# ---------------------------------------------------------------------------

CLS_ID, SEP_ID, VOCAB_SIZE = 0, 2, 250_002  # XLM-R-style special ids


def subword_input_ids(
    tokens: list[str], word_ids: list[int | None]
) -> list[int]:
    """Deterministic stand-in vocabulary lookup: input_id for a subword =
    crc32(token|occurrence) mapped into the vocab range, specials CLS/SEP.
    A real SentencePiece tokenizer replaces this function AND
    whitespace_word_ids together; everything downstream (alignment, the
    Spark job's schema and batching) is tokenizer-agnostic."""
    import zlib

    out: list[int] = []
    seen: dict[int, int] = {}
    for pos, widx in enumerate(word_ids):
        if widx is None:
            out.append(CLS_ID if pos == 0 else SEP_ID)
            continue
        nth = seen.get(widx, 0)
        seen[widx] = nth + 1
        tok = tokens[widx] if widx < len(tokens) else ""
        h = zlib.crc32(f"{tok}|{nth}".encode("utf-8"))
        out.append(3 + h % (VOCAB_SIZE - 3))
    return out


def tokenized_training_rows(sentences, max_len: int = 128):
    """(sent_id, tokens, tags) -> (sent_id, input_ids, labels) — the
    training-data relation the reference materializes as an HF Dataset
    (train_ner.py:252-303 tokenize_and_align_labels + :358-363 set_format),
    produced as ONE mapInPandas pass (Arrow batches, model-free, no
    shuffle). labels carry the -100 sentinel exactly as align_labels
    specifies (first-subword label, B->I continuation, specials ignored)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("sent_id", LongType()),
            StructField("input_ids", ArrayType(IntegerType())),
            StructField("labels", ArrayType(IntegerType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, toks, tags in zip(
                pdf["sent_id"], pdf["tokens"], pdf["tags"]
            ):
                toks = list(toks)
                tags = list(tags)
                wids = whitespace_word_ids(toks, max_len)
                rows.append(
                    (
                        int(sid),
                        subword_input_ids(toks, wids),
                        align_labels(wids, tags),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["sent_id", "input_ids", "labels"]
            )

    return sentences.select("sent_id", "tokens", "tags").mapInPandas(
        run, schema=schema
    )
