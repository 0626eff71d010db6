"""Single-parallelism KG bench leg (invoked by bench.py in a fresh JVM).

Separate process per parallelism level: restarting a SparkSession with a
different local[k] master inside one JVM leaves a stale Python-accumulator
socket (observed: 9x slowdown + socket write stack traces), and a fresh JVM
is the honest analogue of submitting to a differently-sized cluster anyway.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--parts", type=int, default=64)
    ap.add_argument(
        "--extract-only",
        action="store_true",
        help="time the extraction operator alone (scan->clean->NER->noop); "
        "this is the stage that is >99.9%% of the work at 10^12-file scale "
        "and the object of the N-vs-4N scaling measurement",
    )
    ap.add_argument(
        "--task-cpus",
        type=int,
        default=2,
        help="cores reserved per task (JVM thread + Python worker). Without "
        "this, local[k] runs k JVM threads AND k Python workers — 2x "
        "oversubscription that halves per-worker throughput at saturation. "
        "Real clusters provision pandas-UDF stages the same way.",
    )
    ap.add_argument(
        "--probe-corpus",
        default=None,
        help="Optional small fixed corpus for the STALL PROBE (VERDICT r4 "
        "#1b): the extraction stage runs on it twice in this same JVM "
        "immediately before the timed KG run — first pass untimed (python-"
        "worker start + codegen JIT + page cache), second pass timed and "
        "published as stall_probe_sec. Unlike the engine-free memory-scan "
        "weather probe (which stayed green through the hypervisor stalls "
        "that crushed r4's KG legs — BENCH/BASELINE.md S7 note), this is a "
        "real warm Spark job, so it is sensitive to the JVM/python-worker "
        "stall mechanism and lets a KG wall-clock collapse be attributed "
        "inside the artifact. Side effect: the main run below starts WARM "
        "(protocol v5; r1-r4 ran it cold-JVM), so v5 rates read higher and "
        "less noisy than earlier rounds' — compare within-protocol.",
    )
    ap.add_argument(
        "--max-partition-bytes",
        default="524288",
        help="Scan split size for the tiny-file bench corpus. The default "
        "128m+4m-openCost coalescing collapses the 64-file/30 MB corpus "
        "into ~8-16 splits — as little as ONE task wave at local[32], so "
        "one co-tenant straggler sets the extraction wall clock (the "
        "round-4 scaling-leg finding). r4-r6 ran 128k (~4 splits/file, "
        "~13 waves); r7 re-measured: 512k = 1 split/file = 64 tasks = 4 "
        "waves at 16 slots keeps the straggler amortization while "
        "dropping ~200 tasks of scheduling overhead (warm A/B same "
        "session: 4.6s vs 3.6s extraction pass; 2m was worse again).",
    )
    args = ap.parse_args(argv)

    from kgforge.pipeline import KGPaths, run_extraction, run_graph
    from kgforge.session import get_spark

    spark = get_spark(
        master=f"local[{args.cores}]",
        app_name=f"kgforge-bench-{args.cores}",
        shuffle_partitions=max(args.cores, 16),
        extra_conf={
            "spark.task.cpus": str(args.task_cpus),
            "spark.sql.files.maxPartitionBytes": args.max_partition_bytes,
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.extract_only:
        from kgforge.extract import extract_mentions, with_clean

        source = spark.read.parquet(args.corpus)
        n_files = source.count()
        t0 = time.time()
        m = extract_mentions(with_clean(source))
        m.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(
            json.dumps(
                {
                    "cores": args.cores,
                    "files": n_files,
                    "extract_sec": round(dt, 2),
                    "files_per_sec_extract": round(n_files / dt, 1),
                }
            )
        )
        return 0

    probe_sec = None
    probe_fps = None
    probe_src = None
    if args.probe_corpus:
        from kgforge.extract import extract_mentions, with_clean

        probe_src = spark.read.parquet(args.probe_corpus)
        n_probe = probe_src.count()
        for timed in (False, True):
            t0 = time.time()
            extract_mentions(with_clean(probe_src)).write.format("noop").mode(
                "overwrite"
            ).save()
            if timed:
                probe_sec = round(time.time() - t0, 3)
                probe_fps = round(n_probe / probe_sec, 1)

    shutil.rmtree(args.out, ignore_errors=True)
    paths = KGPaths(
        mentions=f"{args.out}/mentions",
        triples=f"{args.out}/triples",
        lineage=f"{args.out}/lineage",
    )
    source = spark.read.parquet(args.corpus)
    n_files = source.count()

    t0 = time.time()
    run_extraction(spark, source, paths, n_parts=args.parts, resume=False)
    t_extract = time.time() - t0
    t1 = time.time()
    triples = run_graph(spark, paths, n_parts=args.parts)
    n_triples = triples.count()
    t_graph = time.time() - t1
    total = time.time() - t0

    # POST-run probe (protocol v6): the pre-run probe misses a stall that
    # BEGINS mid-run (observed r6: rate crushed 2x while the pre-probe read
    # a clean 1.24 s). The gate in bench.py uses max(pre, post), so a stall
    # window overlapping either end of the run flags it; only a stall
    # strictly inside the run's interior remains invisible.
    probe_post_sec = None
    if probe_src is not None:
        from kgforge.extract import extract_mentions, with_clean

        t0p = time.time()
        extract_mentions(with_clean(probe_src)).write.format("noop").mode(
            "overwrite"
        ).save()
        probe_post_sec = round(time.time() - t0p, 3)

    print(
        json.dumps(
            {
                "cores": args.cores,
                "files": n_files,
                "triples": n_triples,
                "extract_sec": round(t_extract, 2),
                "graph_sec": round(t_graph, 2),
                "total_sec": round(total, 2),
                "triples_per_sec": round(n_triples / total, 1),
                "files_per_sec_extract": round(n_files / t_extract, 1),
                "stall_probe_sec": probe_sec,
                "stall_probe_post_sec": probe_post_sec,
                "stall_probe_files_per_sec": probe_fps,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
