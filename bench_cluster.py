"""Multi-executor scaling bench: the north-rule launch path, measured.

The rule requires spark-submit --py-files on a multi-executor cluster
at N and 4N EXECUTORS with throughput scaling efficiency >= 0.8.
bench.py's --scaling mode proxies executors with local[N] threads (one
JVM); this harness removes that approximation: Spark's
``local-cluster[n, cores, mem]`` master launches n REAL standalone
executor JVMs (separate processes, real Netty shuffle + serialization
boundaries, per-executor Python worker pools), so

    spark-submit --master local-cluster[1,2,4096] --py-files extractor.zip
    spark-submit --master local-cluster[4,2,4096] --py-files extractor.zip

is literally 1 executor vs 4 executors (2 cores each) running the
flagship extraction — the closest realizable instance of the rule in a
single-host sandbox. Executor counts are chosen so both levels sit
below the single-box memory-bandwidth knee (~16 cores; analysis in
BENCH/BASELINE.md), preserving the per-executor-memory-bus property of
a real cluster comparison.

Two roles in one file:
- ``--orchestrate``: builds extractor.zip (job.make_pyfiles_zip),
  ensures the cached 200k-turn input, then runs n interleaved
  (1-exec, 4-exec) spark-submit pairs and prints per-pair throughput
  + the median pair efficiency eff = (thr_4N / thr_N) / 4.
- no flag (the spark-submit app): builds the session from the
  submitted conf, warms every Python worker, times the full pipeline
  (salted repartition -> Arrow mapInPandas -> noop sink) best-of-2,
  prints ONE JSON line. Timing starts after session + worker warmup,
  identical to bench.py's methodology, so cluster startup (~15s of
  JVM forking) is excluded from the throughput ratio at both levels.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

EXEC_CORES = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "2"))
EXEC_MEM_MB = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "4096"))
# executors: N and 4N (override e.g. SPARK_GRAFT_CLUSTER_LEVELS=2,8)
LEVELS = tuple(int(x) for x in os.environ.get(
    "SPARK_GRAFT_CLUSTER_LEVELS", "1,4").split(","))


def app() -> None:
    """The spark-submit application: time the flagship extraction."""
    from pyspark.sql import SparkSession

    from extractor import job

    inp = sys.argv[sys.argv.index("--input") + 1]
    spark = SparkSession.builder.getOrCreate()  # master from submit
    tr = job.read_transcripts(spark, inp)
    # warm-up: small tasks across many partitions so every executor
    # registers and its Python workers have paid import cost before
    # the timed run (also before the executor/core probe below —
    # probed at session start both counts read 0/2, the standalone
    # master hadn't finished registering executors yet)
    (job.plan_extract(tr.limit(1600), 64)
     .write.format("noop").mode("overwrite").save())
    cores = spark.sparkContext.defaultParallelism
    n_execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus() \
        .size() - 1  # minus the driver entry
    n_turns = tr.count()
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        (job.plan_extract(tr, 512)
         .write.format("noop").mode("overwrite").save())
        best = min(best, time.time() - t0)
    print(json.dumps({
        "executors": n_execs, "cores_total": cores,
        "turns": n_turns, "sec": round(best, 3),
        "turns_per_sec": round(n_turns / best, 1)}))
    spark.stop()


def _submit(n_execs: int, zip_path: str, inp: str) -> dict:
    spark_submit = "spark-submit"
    env = {**os.environ,
           "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}
    res = subprocess.run(
        [spark_submit,
         "--master",
         "local-cluster[{},{},{}]".format(n_execs, EXEC_CORES,
                                          EXEC_MEM_MB),
         "--conf", "spark.executor.memory={}m".format(EXEC_MEM_MB),
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=64",
         "--py-files", zip_path,
         os.path.abspath(__file__), "--input", inp],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    if res.returncode != 0:
        raise RuntimeError(res.stderr[-4000:])
    line = [ln for ln in res.stdout.splitlines()
            if ln.startswith("{")][-1]
    out = json.loads(line)
    print("  local-cluster[{},{},{}]: {}".format(
        n_execs, EXEC_CORES, EXEC_MEM_MB, line), file=sys.stderr)
    return out


def orchestrate(n_pairs: int = 3) -> None:
    import bench
    from extractor.job import make_pyfiles_zip

    inp = bench.bench_input()
    zip_path = make_pyfiles_zip(
        os.path.join(bench.BENCH_DATA, "extractor.zip"))
    factor = LEVELS[1] / LEVELS[0]
    pairs = []
    for i in range(n_pairs):
        print("pair {}/{}".format(i + 1, n_pairs), file=sys.stderr)
        lo = _submit(LEVELS[0], zip_path, inp)
        hi = _submit(LEVELS[1], zip_path, inp)
        eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / factor
        pairs.append({"lo": lo, "hi": hi, "eff": round(eff, 3)})
        print("  pair efficiency: {:.3f}".format(eff), file=sys.stderr)
    med = statistics.median(p["eff"] for p in pairs)
    print(json.dumps({
        "metric": "executor_scaling_efficiency_{}to{}".format(*LEVELS),
        "value": round(med, 3),
        "unit": "ratio",
        "launch": "spark-submit --py-files extractor.zip "
                  "--master local-cluster[n,{},{}]".format(
                      EXEC_CORES, EXEC_MEM_MB),
        "pairs": pairs,
    }))


if __name__ == "__main__":
    if "--orchestrate" in sys.argv:
        orchestrate(int(os.environ.get("SPARK_GRAFT_CLUSTER_PAIRS", "3")))
    else:
        app()
