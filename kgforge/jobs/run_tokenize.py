"""Tokenized-training-rows job (VERDICT r1 #7; train_ner.py:252-303).

Materializes the (sent_id, input_ids, labels) training-data relation —
what the reference builds driver-side as an HF Dataset — as a partitioned
parquet table via one mapInPandas pass.

Usage:
    python -m kgforge.jobs.run_tokenize --synth 500 --output /tmp/tok
    python -m kgforge.jobs.run_tokenize --conll <glob> --output /tmp/tok
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--conll", help="CoNLL file/glob of labeled sentences")
    src.add_argument("--synth", type=int, help="derive sentences from N synthetic files")
    ap.add_argument("--output", required=True)
    ap.add_argument("--max-len", type=int, default=128)
    ap.add_argument("--parts", type=int, default=16)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from kgforge.alignment import tokenized_training_rows
    from kgforge.materialize import with_part_id, write_partitioned
    from kgforge.session import get_spark

    spark = get_spark(master=args.master, app_name="kgforge-tokenize")
    spark.sparkContext.setLogLevel("WARN")

    if args.conll:
        from kgforge.conll import read_conll

        sentences = read_conll(spark, args.conll)
    else:
        from kgforge.jobs.run_interpret import golden_and_predicted

        sentences, _ = golden_and_predicted(spark, None, args.synth)

    rows = tokenized_training_rows(sentences, max_len=args.max_len)
    rows = with_part_id(rows, ["sent_id"], args.parts)
    write_partitioned(rows, args.output)

    written = spark.read.parquet(args.output)
    stats = written.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.size("input_ids")).alias("n_subwords"),
        F.sum(
            F.size(F.filter("labels", lambda l: l != F.lit(-100)))
        ).alias("n_supervised"),
    ).first()
    print(
        json.dumps(
            {
                "n_rows": stats["n_rows"],
                "n_subwords": int(stats["n_subwords"]),
                "n_supervised_positions": int(stats["n_supervised"]),
                "output": args.output,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
