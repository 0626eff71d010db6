"""Span-evaluation job (reference `python -m src.modeling.train_ner` eval
half + interpret.py eval — SURVEY §3.2). Produces an
evaluation_results.json-shaped artifact from a CoNLL corpus, with the
evaluation itself distributed (metrics.span_prf equi-join, N9).

Usage:
    python -m kgforge.jobs.run_eval --conll <file-or-glob> --output eval.json
    python -m kgforge.jobs.run_eval --synth 500 --output eval.json
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--conll", help="CoNLL file/glob of golden sentences")
    src.add_argument("--synth", type=int, help="derive sentences from N synthetic files")
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from kgforge import metrics
    from kgforge.bio import repair_tags_udf
    from kgforge.session import get_spark

    spark = get_spark(master=args.master, app_name="kgforge-eval")
    spark.sparkContext.setLogLevel("WARN")

    if args.conll:
        from kgforge.conll import read_conll

        golden = read_conll(spark, args.conll)
    else:
        from kgforge.clean import clean_text
        from kgforge.synth import synth_source_files

        files = synth_source_files(spark, args.synth).withColumn(
            "clean", clean_text(F.col("content"))
        )
        golden_tokens = files.select(
            F.monotonically_increasing_id().alias("sent_id"),
            F.split("clean", " ").alias("tokens"),
        ).filter(F.size("tokens") > 0).localCheckpoint()
        # golden tags = repaired model tags (self-eval fixture)
        from kgforge.ner_model import model_tags_udf

        golden = golden_tokens.withColumn(
            "tags", repair_tags_udf("tokens", model_tags_udf("tokens"))
        )

    # "prediction" run: model tags + repair over the same sentences
    from kgforge.ner_model import model_tags_udf

    predicted = golden.select("sent_id", "tokens").withColumn(
        "tags", repair_tags_udf("tokens", model_tags_udf("tokens"))
    )

    g_spans = metrics.spans_table(golden)
    p_spans = metrics.spans_table(predicted)
    overall = metrics.span_prf(g_spans, p_spans)
    per_type = {
        r.entity_type: {
            "tp": r.tp,
            "n_golden": r.n_golden,
            "n_predicted": r.n_predicted,
            "precision": r.precision,
            "recall": r.recall,
        }
        for r in metrics.per_type_prf(g_spans, p_spans).collect()
    }
    result = {
        "eval_precision": overall["precision"],
        "eval_recall": overall["recall"],
        "eval_f1": overall["f1"],
        "n_sentences": golden.count(),
        "per_type": per_type,
    }
    with open(args.output, "w", encoding="utf-8") as f:
        json.dump(result, f, indent=2, ensure_ascii=False)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
