"""Vendor-scorecard job (reference: ethiomart_fintech/scripts/
generate_scorecards.py --all — SURVEY §3.3), one lazy DAG per run.

Usage:
    python -m kgforge.jobs.run_scorecards --posts <parquet> --output dir/
    python -m kgforge.jobs.run_scorecards --synth 600 --output dir/
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--posts", help="parquet of posts (messages schema)")
    src.add_argument("--synth", type=int, help="generate N synthetic posts")
    ap.add_argument("--output", required=True, help="output dir for scorecards json")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from kgforge.scorecard import generate_scorecards
    from kgforge.session import get_spark
    from kgforge.synth import synth_messages

    spark = get_spark(master=args.master, app_name="kgforge-scorecards")
    spark.sparkContext.setLogLevel("WARN")

    posts = (
        spark.read.parquet(args.posts) if args.posts else synth_messages(spark, args.synth)
    )
    cards = generate_scorecards(posts)
    cards.coalesce(1).write.mode("overwrite").json(args.output)
    rows = cards.orderBy("channel").collect()
    print(
        json.dumps(
            {
                "vendors": len(rows),
                "scores": {r.channel: r.lending_score for r in rows},
                "output": args.output,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
