"""Text normalization chain (SURVEY.md F5-F9) — Catalyst expressions.

Reproduces the reference's ``clean_text`` semantics
(reference: src/preprocessing/data_cleaner.py:52-68) as a pure
whole-stage-codegen expression chain — no Python in the hot path:

1. null / '[no text]' sentinel -> ''          (P2, data_cleaner.py:54-55)
2. price canonicalization  -> '<amount> ብር'   (F5, data_cleaner.py:57-58)
3. URL strip                                   (F6, data_cleaner.py:60-61)
4. charset strip (keep word/space/Ethiopic/.,!?) (F7, data_cleaner.py:63-64)
5. whitespace normalize + trim                 (F8, data_cleaner.py:66-68)

Java-regex notes: ``(?iU)`` replicates Python's default unicode ``\\w``/``\\s``
classes (Python ``re`` is unicode-aware by default; Java needs the ``u`` flag);
replacement groups use ``$1`` instead of Python's ``\\1``.

``kgforge.oracle.py_clean_text`` is the frozen pure-Python twin; the two are
compared row-for-row on the synthetic corpus in tests/test_clean.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Python source pattern at data_cleaner.py:31 — translated to Java regex.
PRICE_PAT = r"(\d{1,3}(?:,\d{3})*(?:\.\d+)?)\s*(ብር|birr|br|ዶላር|dollar)"
PHONE_PAT = r"(09\d{8}|9\d{8})"
PRODUCT_PAT = r"(ሽያጭ|ለመግዛት|ይግዙ|ይሸጥ|ለሽያጭ|ገዝተውልኝ)\s*([^\n]+)"
SKU_PAT = r"^[A-Za-z0-9][A-Za-z0-9/-]{2,}$"  # data_pipeline.py:59-61
URL_PAT = r"(?U)https?://\S+|www\.\S+"
CHARSET_PAT = "(?U)[^\\w\\s\\u1200-\\u137F.,!?]"
WS_PAT = r"(?U)\s+"

NO_TEXT_SENTINEL = "[no text]"


def clean_text(col: Column) -> Column:
    """F5-F8 normalization chain as one Catalyst expression."""
    c = F.when(col.isNull() | (col == NO_TEXT_SENTINEL), F.lit("")).otherwise(col)
    c = F.regexp_replace(c, f"(?iU){PRICE_PAT}", "$1 ብር")
    c = F.regexp_replace(c, URL_PAT, "")
    c = F.regexp_replace(c, CHARSET_PAT, "")
    c = F.trim(F.regexp_replace(c, WS_PAT, " "))
    return c


import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_EMOJI_RE_SRC = "[\U0001f000-\U0001fbff☀-➿️]+"


@pandas_udf(StringType())
def _nfkc_udf(s: pd.Series) -> pd.Series:
    import re as _re
    import unicodedata

    emoji_re = _re.compile(_EMOJI_RE_SRC, _re.UNICODE)

    def fix(x):
        if x is None:
            return ""
        x = emoji_re.sub("[EMOJI]", x)
        return unicodedata.normalize("NFKC", x)

    return s.map(fix)


def nfkc_normalize(col: Column) -> Column:
    """F9 — emoji sentinel + NFKC (data_pipeline.py:88-90 semantics).

    One of the two genuine Python needs in the engine (no Catalyst NFKC);
    vectorized over Arrow batches, never per-row.
    """
    return _nfkc_udf(col)
