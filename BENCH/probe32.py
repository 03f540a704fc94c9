"""Probe: why is uncontended local[32] slower than local[8] on the feature
pipeline? (VERDICT r3 task 4.)

Runs the salted feature pipeline on the bench corpus under a matrix of
(master, shuffle_partitions, python-worker knobs), one fresh JVM per cell,
and records wall time, effective cores (process-tree Δcpu/Δwall), JVM GC
time share, and peak task-wave shape. Usage:

    python BENCH/probe32.py [cellspec ...]

cellspec = cores:shuffle[:opt=val,...]   e.g.  32:128  8:32  32:64:arrow=2000
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "corpus", "128x100000", "ticks.parquet")


def gc_ms(spark):
    beans = (spark.sparkContext._jvm.java.lang.management.ManagementFactory
             .getGarbageCollectorMXBeans())
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def jit_ms(spark):
    return (spark.sparkContext._jvm.java.lang.management.ManagementFactory
            .getCompilationMXBean().getTotalCompilationTime())


def code_cache(spark) -> dict:
    """JIT code-cache pool usage/max (MB): when these pools run full the JVM
    flushes + recompiles hot methods in a storm — the suspected slow mode."""
    beans = (spark.sparkContext._jvm.java.lang.management.ManagementFactory
             .getMemoryPoolMXBeans())
    out = {}
    for i in range(beans.size()):
        b = beans.get(i)
        name = b.getName()
        if "CodeHeap" in name or "Code Cache" in name:
            u = b.getUsage()
            out[name] = {"used_mb": round(u.getUsed() / 2**20, 1),
                         "max_mb": round(u.getMax() / 2**20, 1)}
    return out


def stage_breakdown(spark, since_epoch: float = 0.0,
                    top: int = 10) -> list[dict]:
    """Per-stage executorRunTime from the UI REST API — which stage owns the
    CPU when a run doubles. Stages submitted before `since_epoch` (the
    warm-up) are excluded."""
    import json as _json
    import urllib.request
    from datetime import datetime, timezone
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages",
                                    timeout=10) as r:
            stages = _json.load(r)
    except Exception as e:                                    # noqa: BLE001
        return [{"error": str(e)}]

    def sub_epoch(s):
        t = s.get("submissionTime", "")
        try:
            return datetime.strptime(t, "%Y-%m-%dT%H:%M:%S.%fGMT").replace(
                tzinfo=timezone.utc).timestamp()
        except ValueError:
            return 0.0

    rows = [{"id": s["stageId"], "attempt": s["attemptId"],
             "name": s["name"].split("\n")[0][:70],
             "run_sec": round(s.get("executorRunTime", 0) / 1000, 1),
             "cpu_sec": round(s.get("executorCpuTime", 0) / 1e9, 1),
             "tasks": s.get("numCompleteTasks", 0)}
            for s in stages
            if s.get("status") == "COMPLETE" and sub_epoch(s) >= since_epoch]
    rows.sort(key=lambda r: -r["run_sec"])
    return rows[:top]


def mini_ceiling() -> dict:
    """host_cpu_ceiling at k=1/8/32 (one warm + one rep each, ~8 s): the
    host's PHYSICAL capacity right now. sec_32 tracking ceiling-32 collapse
    while gc/eff-cores stay flat is the named-host-ceiling attribution."""
    from concurrent.futures import ProcessPoolExecutor
    import bench
    out = {}
    t1 = None
    for k in (1, 8, 32):
        with ProcessPoolExecutor(max_workers=k) as ex:
            list(ex.map(bench._burn, range(k)))
            t0 = time.time()
            list(ex.map(bench._burn, range(k)))
            tk = time.time() - t0
        if t1 is None:
            t1 = tk
            out["t1_sec"] = round(tk, 3)
        out[str(k)] = round(k * t1 / tk, 2)
    return out


def cpu_by_comm() -> dict[str, float]:
    """CPU seconds of this process tree split by process name (java vs
    python): locates whether excess CPU burns JVM-side or worker-side."""
    import glob
    me = os.getpid()
    procs = {}
    for stat in glob.glob("/proc/[0-9]*/stat"):
        try:
            with open(stat) as f:
                head, rest = f.read().rsplit(") ", 1)
            pid = int(head.split(" ", 1)[0])
            comm = head.split("(", 1)[1]
            fields = rest.split()
            ppid = int(fields[1])
            cpu = (int(fields[11]) + int(fields[12])) / os.sysconf("SC_CLK_TCK")
            procs[pid] = (ppid, comm, cpu)
        except (OSError, IndexError, ValueError):
            continue
    children: dict[int, list[int]] = {}
    for pid, (ppid, _, _) in procs.items():
        children.setdefault(ppid, []).append(pid)
    out: dict[str, float] = {}
    stack = [me] + list(children.get(me, []))
    seen = set()
    while stack:
        p = stack.pop()
        if p in seen or p not in procs:
            continue
        seen.add(p)
        _, comm, cpu = procs[p]
        key = ("java" if "java" in comm
               else "python" if "python" in comm else "other")
        out[key] = out.get(key, 0.0) + cpu
        stack.extend(children.get(p, []))
    return out


def run_cell(cores: int, shuffle: int, opts: dict[str, str]) -> dict:
    import bench
    from pyspark.sql import functions as F
    from forex_feature_generator_spark.engine import skew as eskew
    from forex_feature_generator_spark.engine.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    extra = {}
    if "arrow" in opts:
        extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = opts["arrow"]
    if "reuse" in opts:
        extra["spark.python.worker.reuse"] = opts["reuse"]
    if "cc" in opts:   # e.g. cc=512m -> bigger JIT code cache
        extra["spark.driver.extraJavaOptions"] = \
            f"-XX:ReservedCodeCacheSize={opts['cc']}"
    if opts.get("aqe") == "off":
        extra["spark.sql.adaptive.enabled"] = "false"
    spark = get_spark(f"probe-{cores}-{shuffle}", master=f"local[{cores}]",
                      shuffle_partitions=shuffle, extra_conf=extra)
    try:
        ticks = spark.read.parquet(CORPUS)
        if opts.get("fullwarm"):
            # full untimed run: identical plans (incl. AQE decisions) compiled
            # before the timed run — tests the compile-on-first-full-plan
            # hypothesis for the slow mode
            eskew.run_pipeline_salted(spark, ticks, chunk_bars=4000).count()
        else:
            warm_sources = [r[0] for r in
                            ticks.select("source").distinct().limit(2).collect()]
            eskew.run_pipeline_salted(
                spark, ticks.filter(F.col("source").isin(warm_sources)),
                chunk_bars=4000).count()
        chunk_bars = int(opts.get("chunk", "4000"))
        ceil_pre = mini_ceiling()
        split0 = cpu_by_comm()
        g0, c0, t0 = gc_ms(spark), bench._tree_cpu_seconds(), time.time()
        j0 = jit_ms(spark)
        rows = eskew.run_pipeline_salted(spark, ticks,
                                         chunk_bars=chunk_bars).count()
        dt = time.time() - t0
        split1 = cpu_by_comm()
        ceil_post = mini_ceiling()
        return {
            "cores": cores, "shuffle": shuffle, "opts": opts,
            "sec": round(dt, 2), "rows": rows,
            "rows_per_sec": round(rows / dt, 1),
            "effective_cores": round((bench._tree_cpu_seconds() - c0) / dt, 2),
            "gc_sec": round((gc_ms(spark) - g0) / 1000, 2),
            "jit_sec": round((jit_ms(spark) - j0) / 1000, 2),
            "ceiling_pre": ceil_pre, "ceiling_post": ceil_post,
            "cpu_split": {k: round(split1.get(k, 0) - split0.get(k, 0), 1)
                          for k in ("java", "python", "other")},
            "code_cache": code_cache(spark),
            "stages": stage_breakdown(spark, since_epoch=t0),
        }
    finally:
        spark.stop()


def main():
    cells = sys.argv[1:] or ["8:32", "32:32", "32:128"]
    results = []
    for spec in cells:
        parts = spec.split(":")
        cores, shuffle = int(parts[0]), int(parts[1])
        opts = dict(kv.split("=") for kv in parts[2].split(",")) if len(parts) > 2 else {}
        # fresh JVM per cell for JIT fairness
        import subprocess
        code = (f"import sys; sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r}); "
                f"import probe32, json; "
                f"print('CELL ' + json.dumps(probe32.run_cell({cores}, {shuffle}, {opts!r})))")
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=1800)
        for line in out.stdout.splitlines():
            if line.startswith("CELL "):
                r = json.loads(line[5:])
                results.append(r)
                print(json.dumps(r), flush=True)
                break
        else:
            print(json.dumps({"cell": spec, "error": out.stderr[-800:]}), flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
