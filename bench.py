"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR + KG throughput
+ two-parallelism scaling (the sandbox stand-in for N vs 4N executors).

Prints ONE JSON line:
  {"metric": "triples_per_sec", "value": <kg throughput at local[CPUS]>,
   "unit": "sec", "queries": {name: warm seconds, ...}, "sf": <sf>,
   "kg": {...}, "scaling": {...}}

Methodology (BENCH/BASELINE.md §2):
- query timings: full execution forced with a noop sink; each query runs
  twice and the WARM (second) time is reported — first-run session/scan
  warmup is reported separately under queries_cold so regressions in either
  are visible (VERDICT r1 item 10);
- KG throughput: run_kg over a pre-materialized seeded synthetic corpus,
  best-of-2 (single-shot wall time on this shared VM swings up to 6x with
  host weather; see scaling.host_drift_control);
- scaling: N vs 4N = local[2] vs local[8] primary (+ saturated 8 vs 32
  secondary), measured WARM and INTERLEAVED: two persistent leg JVMs, one
  untimed warmup pass each, then ROUNDS alternating lo/hi timed passes.
  Reported: per-leg medians + IQR, raw efficiency (median_hi/median_lo)/4,
  and paired efficiency (median over rounds of per-round ratios — adjacent
  trials cancel the host's measured 1.8x single-thread speed drift).
  Controls in the same JSON: the single-thread drift probe and a pure-CPU
  multiprocess md5 probe at the same 8-vs-32 parallelism (the host ceiling
  the VERDICT asked to ship with the artifact).
"""

from __future__ import annotations

import hashlib
import json
import os
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
KG_FILES = int(os.environ.get("KGFORGE_BENCH_FILES", "400000"))
CORPUS = f"/tmp/kgforge_bench_corpus_{KG_FILES}"
ROUNDS = int(os.environ.get("KGFORGE_SCALING_ROUNDS", "5"))
SCALE_FILES = int(os.environ.get("KGFORGE_SCALING_FILES", "200000"))
SCALE_CORPUS = f"/tmp/kgforge_scaling_corpus_{SCALE_FILES}"
# Primary N-vs-4N pair: local[2] vs local[8] — both legs far below the
# host's aggregate-capacity ceiling (this shared VM intermittently caps
# total throughput; a wide leg gets crushed by that weather while a narrow
# one is untouched, which would measure the HOST, not the engine). The
# saturated 8-vs-32 pair is also reported, with its own pure-CPU ceiling
# control at the same parallelism.
LO_CORES, HI_CORES = 2, 8
SAT_LO, SAT_HI = 8, 32
SAT_ROUNDS = int(os.environ.get("KGFORGE_SAT_ROUNDS", "2"))

HEADLINE = [
    "q01_pricing_summary",
    "q03_top_order_per_customer",
    "q07_segment_revenue",
    "q12_dateparts",
    "q22_minhash_lsh",
    "q24_simhash",
    "q41_simhash64_fast",
    "q25_quality_scores",
    "q29_cosine_topk",
    "q31_centroid_cosine",
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def new_session(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from kgforge.session import get_spark

    s = get_spark(master=f"local[{cores}]", app_name=f"kgforge-bench-{cores}",
                  shuffle_partitions=max(cores, 16))
    s.sparkContext.setLogLevel("ERROR")
    return s


def run_queries(spark) -> tuple[dict[str, float], dict[str, float]]:
    """Each headline query twice: (warm, cold) second/first-run timings."""
    from kgforge.queries import REGISTRY

    warm: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        times = []
        for _ in range(2):
            t0 = time.time()
            df = REGISTRY[name].fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        cold[name], warm[name] = times[0], times[1]
        log(f"  {name}: cold {times[0]}s / warm {times[1]}s")
    return warm, cold


def run_full_kg(cores: int) -> dict:
    out_dir = f"/tmp/kgforge_bench_kg_{cores}"
    proc = subprocess.run(
        [sys.executable, "-m", "kgforge.jobs.bench_kg",
         "--cores", str(cores), "--corpus", CORPUS, "--out", out_dir],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if proc.returncode != 0:
        log(proc.stderr[-2000:])
        raise RuntimeError(f"full KG bench cores={cores} failed")
    return json.loads(proc.stdout.strip().splitlines()[-1])


class Leg:
    """Persistent warm bench leg (see kgforge/jobs/bench_leg_server.py)."""

    def __init__(self, cores: int, corpus: str):
        self.cores = cores
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "kgforge.jobs.bench_leg_server",
             "--cores", str(cores), "--corpus", corpus],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        self.ready = json.loads(self.proc.stdout.readline())
        log(f"  leg local[{cores}] warm (warmup {self.ready['warmup_sec']}s)")

    def run(self) -> dict:
        self.proc.stdin.write("RUN\n")
        self.proc.stdin.flush()
        return json.loads(self.proc.stdout.readline())

    def close(self):
        try:
            self.proc.stdin.write("QUIT\n")
            self.proc.stdin.flush()
        except Exception:
            pass
        self.proc.wait(timeout=60)


def _iqr(vals: list[float]) -> list[float]:
    qs = statistics.quantiles(vals, n=4) if len(vals) >= 3 else [min(vals), max(vals), max(vals)]
    return [round(qs[0], 1), round(qs[2], 1)]


def host_drift_probe(samples: int = 10) -> dict:
    """Single-thread md5 speed sampled over time: the VM's speed drift."""
    rates = []
    b = b"x" * 64
    for _ in range(samples):
        t0 = time.time()
        n = 0
        while time.time() - t0 < 0.5:
            for _ in range(2000):
                b = hashlib.md5(b).digest()
            n += 2000
        rates.append(n / 0.5)
        time.sleep(0.2)
    return {
        "metric": "single_thread_md5_per_sec",
        "min": min(rates), "max": max(rates),
        "max_over_min": round(max(rates) / min(rates), 2),
    }


def _md5_worker(dur: float, out):
    t0 = time.time()
    b = b"y" * 64
    n = 0
    while time.time() - t0 < dur:
        for _ in range(5000):
            b = hashlib.md5(b).digest()
        n += 5000
    out.put(n)


def host_ceiling_probe(lo: int, hi: int, dur: float = 3.0) -> dict:
    """Pure-CPU multiprocess md5 at the same lo/hi parallelism as the bench
    legs: the host's own scaling ceiling, measured in the same run."""
    import multiprocessing as mp

    def rate(nproc: int) -> float:
        q = mp.Queue()
        ps = [mp.Process(target=_md5_worker, args=(dur, q)) for _ in range(nproc)]
        for p in ps:
            p.start()
        total = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        return total / dur

    r_lo, r_hi = rate(lo), rate(hi)
    return {
        "metric": "multiproc_md5_per_sec",
        "procs": [lo, hi],
        "rates": [round(r_lo), round(r_hi)],
        "efficiency": round((r_hi / r_lo) / (hi / lo), 3),
    }


def measure_pair(lo: int, hi: int, rounds: int, corpus: str) -> dict:
    """Interleaved warm N-vs-4N measurement + host-noise controls."""
    log(f"scaling: warm interleaved local[{lo}] vs local[{hi}], "
        f"{rounds} rounds on {corpus}")
    lo_leg, hi_leg = Leg(lo, corpus), Leg(hi, corpus)
    n_files = lo_leg.ready["files"]
    lo_t, hi_t = [], []
    try:
        for i in range(rounds):
            a = lo_leg.run()
            b = hi_leg.run()
            lo_t.append(a["sec"])
            hi_t.append(b["sec"])
            log(f"  round {i + 1}: lo {a['sec']}s  hi {b['sec']}s")
    finally:
        lo_leg.close()
        hi_leg.close()

    ratio = hi / lo
    med_lo, med_hi = statistics.median(lo_t), statistics.median(hi_t)
    fps_lo = [round(n_files / t, 1) for t in lo_t]
    fps_hi = [round(n_files / t, 1) for t in hi_t]
    eff_raw = (n_files / med_hi) / (n_files / med_lo) / ratio
    paired = [(a / b) / ratio for a, b in zip(lo_t, hi_t)]
    eff_paired = statistics.median(paired)

    ceiling = host_ceiling_probe(lo, hi)
    eff = round(min(eff_raw, eff_paired), 3)
    return {
        "cores": [lo, hi],
        "cores_ratio": ratio,
        "files": n_files,
        "trials_sec": {"lo": lo_t, "hi": hi_t},
        "files_per_sec": {
            f"local{lo}": {"median": round(n_files / med_lo, 1),
                           "trials": fps_lo, "iqr": _iqr(fps_lo)},
            f"local{hi}": {"median": round(n_files / med_hi, 1),
                           "trials": fps_hi, "iqr": _iqr(fps_hi)},
        },
        "efficiency": eff,
        "efficiency_raw_of_medians": round(eff_raw, 3),
        "efficiency_paired_median": round(eff_paired, 3),
        "host_ceiling_control": ceiling,
        "efficiency_vs_host_ceiling": (
            round(eff / ceiling["efficiency"], 3)
            if ceiling["efficiency"] > 0 else None
        ),
    }


def run_scaling() -> dict:
    primary = measure_pair(LO_CORES, HI_CORES, ROUNDS, SCALE_CORPUS)
    saturated = measure_pair(SAT_LO, SAT_HI, SAT_ROUNDS, SCALE_CORPUS)
    drift = host_drift_probe()
    return {
        "protocol": "warm interleaved trials, persistent JVM per leg, "
                    "task.cpus=2, median + IQR, paired ratios; headline "
                    "efficiency = min(raw-of-medians, paired-median), "
                    "conservatively (BENCH/BASELINE.md §2)",
        "cores": primary["cores"],
        "cores_ratio": primary["cores_ratio"],
        "efficiency_extract": primary["efficiency"],
        "primary_pair": primary,
        "saturated_pair": saturated,
        "host_drift_control": drift,
        "note": "same-socket stand-in for N vs 4N executors. Primary pair "
                "local[2]->local[8] keeps both legs below the shared VM's "
                "intermittent aggregate-capacity cap so the engine, not the "
                "host, is measured; the saturated 8->32 pair ships with its "
                "own pure-CPU ceiling control at identical parallelism. "
                "Efficiency > 1 reflects the host's per-vCPU speed variance "
                "(drift control) averaging out at wider parallelism.",
    }


def main() -> int:
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    # stage the bench corpus once (not timed)
    spark = new_session(CPUS)
    from kgforge.synth import synth_source_files

    for path, n in ((CORPUS, KG_FILES), (SCALE_CORPUS, SCALE_FILES)):
        if not os.path.exists(f"{path}/_SUCCESS"):
            log(f"staging {n}-file corpus at {path}")
            synth_source_files(spark, n, partitions=64).write.mode(
                "overwrite"
            ).parquet(path)

    log(f"headline queries at {SF_DIR} on local[{CPUS}] (cold + warm)")
    queries, queries_cold = run_queries(spark)
    spark.stop()

    log(f"full KG pipeline at local[{CPUS}] (best of 2)")
    runs = [run_full_kg(CPUS) for _ in range(2)]
    full = max(runs, key=lambda r: r["triples_per_sec"])
    full["runs_triples_per_sec"] = [r["triples_per_sec"] for r in runs]
    log(f"  {full}")

    scaling = run_scaling()

    out = {
        "metric": "triples_per_sec",
        "value": full["triples_per_sec"],
        "unit": "sec",
        "queries": queries,
        "queries_cold": queries_cold,
        "sf": float(sf),
        "kg": full,
        "scaling": scaling,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
