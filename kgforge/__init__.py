"""kgforge — a PySpark-native knowledge-graph construction engine.

Brand-new implementation (not a port) reproducing the query/data-processing
semantics of the reference pipeline (yokidans/EthioMart-Amharic-NER, studied
read-only at /root/reference) re-expressed Spark-first:

- DataFrame/SQL + Catalyst for every scan, filter, scalar function,
  aggregation, window, join, dedup and sink (SURVEY.md section 2).
- Vectorized pandas/Arrow UDFs only where Catalyst genuinely can't express
  the semantics (BIO tag repair, span decode, token-sort similarity,
  batched model inference) — never per-row Python.
- Pipeline stages per the north rule: triple extraction -> entity linking
  (MinHash-LSH blocking + token-sort scoring) -> canonicalization
  (iterative connected components) -> deduplicated partitioned materialize
  with per-partition lineage + idempotent resume.
"""

__version__ = "0.1.0"
