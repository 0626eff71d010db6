"""spark-submit entry for the KG construction job (north rule).

Cluster usage (the --py-files path the north rule requires):

    zip -r kgforge.zip kgforge/
    spark-submit --py-files kgforge.zip kgforge/jobs/run_kg.py \
        --input  s3://.../source_files/   (or --synth N for the seeded corpus)
        --output s3://.../kg/
        --parts 4096

Local sandbox:

    python -m kgforge.jobs.run_kg --synth 5000 --output /tmp/kg --parts 32
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F

from kgforge.pipeline import run_kg
from kgforge.session import get_spark
from kgforge.synth import synth_source_files


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="kgforge KG construction job")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet dir of source_files(repo,path,commit,lang,content)")
    src.add_argument("--synth", type=int, help="generate N seeded synthetic source files")
    ap.add_argument("--output", required=True, help="output dir (mentions/ triples/ lineage/)")
    ap.add_argument("--parts", type=int, default=64, help="partition count for materialize")
    ap.add_argument("--master", default=None, help="override spark master (default local[$SPARK_GRAFT_CPUS])")
    ap.add_argument("--no-resume", action="store_true", help="ignore existing lineage")
    ap.add_argument(
        "--upsert", action="store_true",
        help="CDC mode: MERGE this run's triples into the existing triple "
        "table (full-outer merge on (subj,pred,obj), partition-pruned, "
        "idempotent) instead of overwriting it",
    )
    ap.add_argument(
        "--triples-table", default=None,
        help="shared triple-table path for incremental batches (mentions/ "
        "lineage stay under --output); defaults to <output>/triples",
    )
    ap.add_argument(
        "--salience", type=int, default=0, metavar="N",
        help="after the graph phase, rank canonical entities by "
        "scaled-integer PageRank over the co-mention graph and write the "
        "top N to <output>/salience (deterministic, bit-identical at any "
        "parallelism)",
    )
    ap.add_argument(
        "--related", action="append", default=[], metavar="TYPE:SURFACE",
        help="seed entity for personalized PageRank over the co-mention "
        "graph (repeatable); any alias of an entity works — surfaces are "
        "normalized and resolved through the canon_map. Writes the top "
        "--related-top to <output>/related (deterministic)",
    )
    ap.add_argument(
        "--related-top", type=int, default=25, metavar="N",
        help="row count for --related (default 25)",
    )
    args = ap.parse_args(argv)

    spark = get_spark(master=args.master, app_name="kgforge-run-kg")
    spark.sparkContext.setLogLevel("WARN")

    source = (
        spark.read.parquet(args.input)
        if args.input
        else synth_source_files(spark, args.synth)
    )

    t0 = time.time()
    triples = run_kg(
        spark, source, args.output, n_parts=args.parts,
        resume=not args.no_resume, upsert=args.upsert,
        triples_path=args.triples_table,
    )
    n = triples.count()
    dt = time.time() - t0
    by_pred = {
        r["pred"]: r["count"]
        for r in triples.groupBy("pred").count().collect()
    }
    out = {
        "triples": n,
        "by_pred": by_pred,
        "seconds": round(dt, 2),
        "triples_per_sec": round(n / dt, 1),
        "output": args.output,
    }
    paths = None
    if args.salience or args.related:
        from kgforge.pipeline import KGPaths

        paths = KGPaths(
            mentions=f"{args.output}/mentions",
            triples=args.triples_table or f"{args.output}/triples",
            lineage=f"{args.output}/lineage",
        )
    if args.salience:
        from kgforge.pipeline import entity_salience

        sal = entity_salience(spark, paths, n_top=args.salience)
        # top-N is bounded (<= N rows): coalesce(1) keeps the artifact one
        # deterministic file; the heavy DAG above it stays distributed.
        # Stats read the committed file back so the DAG runs exactly once.
        sal.coalesce(1).write.mode("overwrite").parquet(
            f"{args.output}/salience"
        )
        written = spark.read.parquet(f"{args.output}/salience")
        top = (
            written.orderBy(F.col("rank_scaled").desc(), "entity")
            .limit(3)
            .collect()
        )
        out["salience"] = {
            "n_rows": written.count(),
            "top": [
                {"entity": r.entity, "rank_scaled": r.rank_scaled}
                for r in top
            ],
        }
    if args.related:
        from kgforge.pipeline import related_entities

        rel = related_entities(
            spark, paths, seeds=args.related, n_top=args.related_top
        )
        rel.coalesce(1).write.mode("overwrite").parquet(
            f"{args.output}/related"
        )
        written = spark.read.parquet(f"{args.output}/related")
        top = (
            written.orderBy(F.col("rank_scaled").desc(), "entity")
            .limit(3)
            .collect()
        )
        out["related"] = {
            "seeds": args.related,
            "n_rows": written.count(),
            "n_seed_rows": written.filter(F.col("is_seed")).count(),
            "top": [
                {"entity": r.entity, "rank_scaled": r.rank_scaled,
                 "is_seed": r.is_seed}
                for r in top
            ],
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
