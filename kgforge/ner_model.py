"""Batched token-classification stand-in (SURVEY.md N5/N6 plumbing).

The reference runs an XLM-R token classifier per-row through a HF pipeline
(reference: ethiomart_fintech/vendor_analytics/scorecard_engine.py:54-57 —
the hot loop). kgforge runs inference as *batched, vectorized* work inside
``mapInPandas``: tokens in -> per-token logits -> argmax -> BIO tags, with
the model loaded once per executor (broadcast-once pattern), Arrow batches
across the boundary — the CIDR'22 vectorized-UDF shape (PAPERS.md).

The sandbox has no torch/transformers and no trained checkpoint, so the
network forward is a **deterministic stand-in scorer** (`DeterministicTagger`)
that emits logits from token shape (digits/phone/unit/trigger lexicon) —
hermetic, seed-free, identical on every executor. The Spark-side plumbing
(batch shapes, schema, partitioning, span decode) is real and is what the
engine exercises; swapping in a real checkpoint only replaces
``DeterministicTagger.logits``. Deliberate rule-violating initial tags
(orphan I-, unit-as-O, SKU-as-PRODUCT) are part of the stand-in so the
N1-N3 repair rules are exercised end-to-end.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from kgforge.schemas import TAG_TO_ID, TAGS

_PHONE_RE = re.compile(r"^(09\d{8}|9\d{8})$")
_NUM_RE = re.compile(r"^\d{1,3}(,\d{3})*(\.\d+)?$|^\d+(\.\d+)?$")
_SKU_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9/-]{2,}$")
TRIGGERS = ("ሽያጭ", "ለመግዛት", "ይግዙ", "ይሸጥ", "ለሽያጭ", "ገዝተውልኝ", "ግዢ", "እቃ")
UNITS = ("ብር", "birr", "br")


def _h(token: str) -> int:
    """Process-stable token hash (never builtin ``hash``)."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")


def tag_tokens(tokens: list[str]) -> list[str]:
    """Deterministic initial BIO tags — the stand-in network's argmax.

    Intentionally imperfect (mirrors raw model output before repair):
    - price numbers tagged B-PRICE but the following unit token left O
      (repair rule 1 fixture),
    - ~1/13 of numbers emitted as orphan I-PRICE (rule 3 fixture),
    - the token after a trigger word tagged PRODUCT even when SKU-shaped
      (rule 2 veto fixture).
    """
    tags = ["O"] * len(tokens)
    for i, tok in enumerate(tokens):
        if _PHONE_RE.match(tok):
            tags[i] = "B-PHONE"
        elif _NUM_RE.match(tok):
            tags[i] = "I-PRICE" if _h(tok) % 13 == 0 else "B-PRICE"
    for i, tok in enumerate(tokens):
        if tok in TRIGGERS and i + 1 < len(tokens) and tags[i + 1] == "O":
            tags[i + 1] = "B-PRODUCT"
            if i + 2 < len(tokens) and tags[i + 2] == "O" and _h(tokens[i + 2]) % 3 == 0:
                tags[i + 2] = "I-PRODUCT"
    return tags


class DeterministicTagger:
    """Stand-in for the fine-tuned token classifier.

    ``logits`` has the real interface: list-of-token-lists in, a float32
    ndarray [n_tokens, n_labels] per sentence out. A real model drops in by
    replacing this class (tokenize -> forward -> re-align to words, as in
    reference src/modeling/train_ner.py:252-303 subword alignment).
    """

    labels = TAGS

    def logits(self, batch_tokens: list[list[str]]) -> list[np.ndarray]:
        out = []
        for tokens in batch_tokens:
            tags = tag_tokens(tokens)
            m = np.full((len(tokens), len(TAGS)), -4.0, dtype=np.float32)
            for i, t in enumerate(tags):
                m[i, TAG_TO_ID[t]] = 8.0
            out.append(m)
        return out

    def predict_tags(self, batch_tokens: list[list[str]]) -> list[list[str]]:
        """argmax decode (N7 de-padding is a no-op for the stand-in)."""
        return [
            [TAGS[j] for j in m.argmax(axis=1)] for m in self.logits(batch_tokens)
        ]


_MODEL: DeterministicTagger | None = None


def get_model() -> DeterministicTagger:
    """Load-once-per-executor accessor (broadcast-once pattern)."""
    global _MODEL
    if _MODEL is None:
        _MODEL = DeterministicTagger()
    return _MODEL
