"""Evaluation-report job — the interpret.py analogue (VERDICT r1 #5).

Emits the reference's evaluation-report artifact shape (reference
src/evaluation/interpret.py:928-934 report dict + models/fine_tuned/
evaluation_results.json): metadata / metrics (P/R/F1, per-type, class
distribution, num_samples, average_length) / interpretability (failure
cases with +/-2 context, true->pred confusion histogram, per-label token
importance) / recommendations. All statistics computed distributed
(kgforge.report); the golden-vs-predicted fixture contrasts repaired
tags against raw model tags so the report exercises real errors.

Usage:
    python -m kgforge.jobs.run_interpret --synth 500 --output report.json
    python -m kgforge.jobs.run_interpret --conll <glob> --output report.json
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def golden_and_predicted(spark, conll: str | None, synth: int | None):
    """Golden = repaired tags; predicted = RAW model tags (pre-repair) —
    the before/after-repair contrast produces deterministic, non-empty
    failure cases (the stand-in model's deliberate rule violations)."""
    from kgforge.bio import repair_tags_udf
    from kgforge.ner_model import model_tags_udf

    if conll:
        from kgforge.conll import read_conll

        golden = read_conll(spark, conll)
    else:
        from kgforge.clean import clean_text
        from kgforge.synth import synth_source_files

        files = synth_source_files(spark, synth).withColumn(
            "clean", clean_text(F.col("content"))
        )
        tokens = files.select(
            F.xxhash64("repo", "path", "commit").alias("sent_id"),
            F.split("clean", " ").alias("tokens"),
        ).filter(F.size("tokens") > 0).localCheckpoint()
        golden = tokens.withColumn(
            "tags", repair_tags_udf("tokens", model_tags_udf("tokens"))
        )
    predicted = golden.select("sent_id", "tokens").withColumn(
        "tags", model_tags_udf("tokens")
    )
    return golden, predicted


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--conll", help="CoNLL file/glob of golden sentences")
    src.add_argument("--synth", type=int, help="derive sentences from N synthetic files")
    ap.add_argument("--output", required=True)
    ap.add_argument("--max-cases", type=int, default=50)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from kgforge.report import build_report
    from kgforge.session import get_spark

    spark = get_spark(master=args.master, app_name="kgforge-interpret")
    spark.sparkContext.setLogLevel("WARN")

    golden, predicted = golden_and_predicted(spark, args.conll, args.synth)
    report = build_report(golden, predicted, max_failure_cases=args.max_cases)

    with open(args.output, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2, ensure_ascii=False)
    summary = {
        "eval_f1": report["metrics"]["eval_f1"],
        "num_samples": report["metrics"]["num_samples"],
        "n_failure_cases": len(report["interpretability"]["failure_cases"]),
        "n_confusion_types": len(report["interpretability"]["error_confusions"]),
        "n_recommendations": len(report["recommendations"]),
        "output": args.output,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
