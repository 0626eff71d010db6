"""Model-comparison harness — the compare_model.py analogue (VERDICT r1 #6).

Reference (src/modeling/compare_model.py:348-489): loop over N candidate
checkpoints -> train/eval each -> per-model metrics table -> weighted score
0.5*F1 + 0.2*(1 - speed/max) + 0.2*(1 - size/max) + 0.1*(1 - time/max) ->
arg-max winner (compare_model.py:473-481).

kgforge runs the EVALUATION of every candidate distributed (span-match
equi-join per candidate, metrics.span_prf) and the scoring/ranking as one
DataFrame: max-normalization via window over the candidate set, winner via
a rank window (O4). Candidates are stand-in tagger variants (no torch in
the sandbox): the same DeterministicTagger surface with deterministic
degradation profiles, so every candidate's metrics are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgforge import metrics
from kgforge.bio import repair_tags_udf
from kgforge.ner_model import model_tags_udf

# (name, profile, inference_ms, size_mb, train_min) — cost columns are the
# fixed per-checkpoint measurements the reference tabulates
# (compare_model.py:430-440); deterministic stand-ins here.
CANDIDATES = [
    ("afroxlmr-large-sim", "repaired", 31.0, 2200.0, 96.0),
    ("xlmr-base-sim", "raw", 17.0, 1100.0, 54.0),
    ("distil-sim", "degraded", 9.0, 540.0, 31.0),
]


def candidate_predictions(golden: DataFrame, profile: str) -> DataFrame:
    """Deterministic per-profile predictions over the golden sentences."""
    base = golden.select("sent_id", "tokens").withColumn(
        "raw_tags", model_tags_udf("tokens")
    )
    if profile == "repaired":
        out = base.withColumn("tags", repair_tags_udf("tokens", "raw_tags"))
    elif profile == "raw":
        out = base.withColumn("tags", F.col("raw_tags"))
    elif profile == "degraded":
        # deterministically zero out every token whose xxhash64 % 5 == 0
        out = base.withColumn(
            "tags",
            F.zip_with(
                "tokens",
                "raw_tags",
                lambda t, g: F.when(F.xxhash64(t) % 5 == 0, F.lit("O")).otherwise(g),
            ),
        )
    else:
        raise ValueError(profile)
    return out.select("sent_id", "tokens", "tags")


def eval_candidates(spark, golden: DataFrame) -> DataFrame:
    """One row per candidate: distributed span eval + cost columns."""
    g_spans = metrics.spans_table(golden)
    rows = []
    for name, profile, ms, mb, mins in CANDIDATES:
        p_spans = metrics.spans_table(candidate_predictions(golden, profile))
        m = metrics.span_prf(g_spans, p_spans)
        rows.append(
            (name, round(m["f1"], 6), round(m["precision"], 6),
             round(m["recall"], 6), ms, mb, mins)
        )
    return spark.createDataFrame(
        rows,
        "model string, f1 double, precision double, recall double, "
        "inference_ms double, size_mb double, train_min double",
    )


def weighted_ranking(cand: DataFrame) -> DataFrame:
    """The reference's weighted-score ranking (compare_model.py:473-481),
    one window over the candidate set for the max-normalizers."""
    w = Window.partitionBy()
    score = (
        0.5 * F.col("f1")
        + 0.2 * (1 - F.col("inference_ms") / F.max("inference_ms").over(w))
        + 0.2 * (1 - F.col("size_mb") / F.max("size_mb").over(w))
        + 0.1 * (1 - F.col("train_min") / F.max("train_min").over(w))
    )
    ranked = cand.withColumn("weighted_score", F.round(score, 6)).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy().orderBy(
                F.col("weighted_score").desc(), F.col("model")
            )
        ),
    )
    return ranked


def compare_models(spark, golden: DataFrame) -> DataFrame:
    """Full harness: distributed eval per candidate -> weighted ranking."""
    return weighted_ranking(eval_candidates(spark, golden)).orderBy("rank")
