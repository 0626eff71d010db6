"""Scaling experiment: warm-state extraction throughput at one parallelism.

One JVM, one warmup pass (starts Python workers, loads model, compiles
codegen, warms page cache), then N timed passes. Prints one JSON line with
all trial times. Invoked repeatedly/interleaved by the bench driver.
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
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--task-cpus", type=int, default=2)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args(argv)

    from kgforge.extract import extract_mentions, with_clean
    from kgforge.session import get_spark

    t_jvm = time.time()
    spark = get_spark(
        master=f"local[{args.cores}]",
        app_name=f"exp-scaling-{args.cores}",
        shuffle_partitions=max(args.cores, 16),
        extra_conf={"spark.task.cpus": str(args.task_cpus)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    source = spark.read.parquet(args.corpus)
    n_files = source.count()
    jvm_sec = time.time() - t_jvm

    def one_pass() -> float:
        t0 = time.time()
        m = extract_mentions(with_clean(source))
        m.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    warmup_sec = None if args.no_warmup else round(one_pass(), 2)
    trials = [round(one_pass(), 2) for _ in range(args.trials)]
    print(
        json.dumps(
            {
                "cores": args.cores,
                "files": n_files,
                "jvm_sec": round(jvm_sec, 2),
                "warmup_sec": warmup_sec,
                "trials_sec": trials,
                "files_per_sec": [round(n_files / t, 1) for t in trials],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
