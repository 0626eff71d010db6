"""Mention -> (subj, pred, obj) triple emission (north rule core).

Triple shapes (BASELINE.json north_star):
- (repo, declares_entity, "<TYPE>:<canonical surface>")
- ("<TYPE>:<canonical surface>", has_attribute, "<attr>=<value>")
  where PRICE values are comma-stripped numerics (F17,
  reference: ethiomart_fintech/vendor_analytics/metrics_calculator.py:67-71)
  and PHONE values are the digit string.

All Catalyst expressions; dedup is a hash-aggregate ``dropDuplicates`` on
(subj, pred, obj) (D4 — the reference computes message hashes at
telegram_scraper.py:310 but never dedups; we do, per the north rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.schemas import PRED_DECLARES, PRED_HAS_ATTR

_ATTR_NAME = {"PRICE": "amount", "PHONE": "phone", "PRODUCT": "name", "LOC": "loc"}


def entity_key(etype_col, surface_col) -> F.Column:
    return F.concat_ws(":", etype_col, surface_col)


def mentions_to_triples(mentions: DataFrame, surface_col: str = "norm_surface") -> DataFrame:
    """MENTIONS(+norm_surface[+canon_surface]) -> deduplicated triples.

    Pass ``surface_col='canon_surface'`` after canonicalization so all
    member mentions of a component collapse onto one entity key.
    """
    ent = entity_key(F.col("entity_type"), F.col(surface_col))

    declares = mentions.select(
        F.col("repo").alias("subj"),
        F.lit(PRED_DECLARES).alias("pred"),
        ent.alias("obj"),
        F.col("repo").alias("repo"),
    )

    attr_name = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _ATTR_NAME.items() for x in kv]
        ),
        F.col("entity_type"),
    )
    # F17: comma-strip numeric canonicalization for PRICE amounts
    value = F.when(
        F.col("entity_type") == "PRICE",
        F.regexp_replace(F.col(surface_col), "[^0-9.]", ""),
    ).otherwise(F.col(surface_col))
    has_attr = mentions.select(
        ent.alias("subj"),
        F.lit(PRED_HAS_ATTR).alias("pred"),
        F.concat_ws("=", attr_name, value).alias("obj"),
        F.col("repo").alias("repo"),
    )

    # Deterministic dedup: min(repo) as provenance instead of dropDuplicates'
    # arbitrary-row keep, so the triple table is identical at any parallelism
    # (SURVEY.md §7.4 risk 5). Catalyst plans this as partial+final hash agg.
    return (
        declares.unionByName(has_attr)
        .groupBy("subj", "pred", "obj")
        .agg(F.min("repo").alias("repo"))
    )
