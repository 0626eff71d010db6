"""Persistent warm bench leg: one JVM at a fixed parallelism, runs one
timed extraction pass per "RUN" line on stdin, prints one JSON line per
pass. Lets bench.py interleave trials across parallelism levels (A-B-A-B)
with zero JVM-restart cost between trials — the statistically defensible
protocol VERDICT r1 asked for (the host shows 1.8x single-thread speed
drift second-to-second; interleaving + median cancels the slow component).

A fresh process per parallelism level (not a re-mastered session) remains
mandatory: re-mastering one JVM corrupts the Python accumulator channel
(BENCH/BASELINE.md §2).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--task-cpus", type=int, default=2)
    ap.add_argument(
        "--probe-corpus",
        default=None,
        help="Small dedicated corpus for the PROBE command. Without it the "
        "probe falls back to a 1/16 row filter over the main corpus — "
        "which still scans every split, so at a 1-slot leg the probe "
        "costs ~2/3 of a full run in task-wave overhead alone (measured "
        "r6: 30s probe vs 46s run at local[2]). A 20k-file 32-part "
        "corpus keeps the probe a few seconds at every leg width while "
        "still swinging 3-7x inside a stall window.",
    )
    ap.add_argument(
        "--max-partition-bytes",
        default="131072",
        help="Scan split size. The corpus parquet files are ~115 KB each; "
        "the default 128m+4m-openCost coalesces 512 files into only "
        "16-32 splits, so the wide leg ran 2 task waves and one straggler "
        "set its wall time (found round 4). 128k yields ~1 split per file "
        "= 32-128 waves per slot — the many-waves-per-slot shape a real "
        "100 TB job has, which amortizes per-vCPU speed variance.",
    )
    args = ap.parse_args(argv)

    from kgforge.extract import extract_mentions, with_clean
    from kgforge.session import get_spark

    spark = get_spark(
        master=f"local[{args.cores}]",
        app_name=f"bench-leg-{args.cores}",
        shuffle_partitions=max(args.cores, 16),
        extra_conf={
            "spark.task.cpus": str(args.task_cpus),
            "spark.sql.files.maxPartitionBytes": args.max_partition_bytes,
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    source = spark.read.parquet(args.corpus)
    n_files = source.count()

    def one_pass() -> float:
        t0 = time.time()
        extract_mentions(with_clean(source)).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    # Leg stall probe (VERDICT r5 #2): a fixed 1/16-of-corpus extraction
    # pass in THIS JVM at THIS parallelism. r5's two unexplained sub-0.7
    # primary rounds had normal engine-free covariates — whatever stalled
    # the lo leg was visible only to Spark-shaped work inside the leg's
    # own JVM/worker placement, which is exactly what this job measures
    # (the same reasoning as bench_kg's stall probe, applied per leg).
    if args.probe_corpus:
        probe_src = spark.read.parquet(args.probe_corpus)
    else:
        from pyspark.sql import functions as F

        probe_src = source.filter(F.xxhash64("path") % 16 == 0)

    def probe_pass() -> float:
        t0 = time.time()
        extract_mentions(with_clean(probe_src)).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    # warmup pass: python-worker start, codegen JIT, page cache — untimed
    warm = one_pass()
    n_splits = extract_mentions(with_clean(source)).rdd.getNumPartitions()
    print(json.dumps({"ready": True, "cores": args.cores, "files": n_files,
                      "splits": n_splits,
                      "warmup_sec": round(warm, 2)}), flush=True)

    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "PROBE":
            print(json.dumps({"cores": args.cores,
                              "probe_sec": round(probe_pass(), 3)}),
                  flush=True)
            continue
        if cmd != "RUN":
            break
        sec = one_pass()
        print(json.dumps({"cores": args.cores, "sec": round(sec, 3),
                          "files_per_sec": round(n_files / sec, 1)}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
