"""Per-query isolation bench + plan capture (guide §1.4/§1.5).

NOT the driver's timed artifact — bench.py stays frozen. This harness
exists for the optimization round: it times individual queries with the
noop sink (cold + warm), labels jobs, and dumps `.explain("formatted")`
to plans/<tag>/<query>_<suffix>.txt so plan claims in
OPTIMIZATION_r07.md are reproducible.

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 \
      --queries q24_simhash,q22_minhash_lsh --plans plans/r07 --suffix before
  python bench_extra.py --sf-dir /tmp/kgforge_sf1_from_sf1.0_x10 --queries ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", required=True,
                    help="comma-separated registry/DEMOTED names")
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') files")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args(argv)

    from kgforge.queries import REGISTRY
    from kgforge.queries.core import DEMOTED
    from kgforge.session import get_spark

    lookup = {**REGISTRY, **DEMOTED}
    spark = get_spark(master=f"local[{args.cores}]",
                      app_name="kgforge-bench-extra",
                      shuffle_partitions=max(args.cores, 16))
    spark.sparkContext.setLogLevel("ERROR")

    out = {}
    for name in args.queries.split(","):
        name = name.strip()
        if not name:
            continue
        fn = lookup[name].fn
        times = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(f"{name}: {times}", file=sys.stderr, flush=True)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            jdf = fn(spark, args.sf_dir)._jdf
            plan = jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
            with open(f"{args.plans}/{name}_{args.suffix}.txt", "w") as f:
                f.write(plan)
    print(json.dumps({"sf_dir": args.sf_dir, "times": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
