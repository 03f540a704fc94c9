"""Round-7 optimization harness (extra benchmarks; bench.py is frozen).

Times individual declared queries with the EXACT bench.py protocol — one
untimed warm-up + median of N timed noop-sink executions, ops caches
released outside the timed window — and dumps `.explain("formatted")`
plans into plans/r07/.  Usage:

  python bench_extra.py time q10_norm_binning q06_fill [--trials 3]
  python bench_extra.py plan q10_norm_binning --suffix before
  python bench_extra.py all            # full suite, 1 trial each
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "plans", "r07")


def _session():
    from forex_feature_generator_spark.engine.session import get_spark
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    return get_spark("bench_extra", master=f"local[{CPUS}]",
                     shuffle_partitions=max(CPUS, 8))


def time_queries(spark, names, trials=3):
    import __spark_entry__ as em
    from forex_feature_generator_spark.ops import cache as opcache
    qs = em.queries()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        opcache.release_all()
        ts = []
        for _ in range(trials):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            ts.append(time.time() - t0)
            opcache.release_all()
        out[name] = {"median": round(statistics.median(ts), 3),
                     "trials": [round(x, 3) for x in ts]}
        print(json.dumps({name: out[name]}), flush=True)
    return out


def dump_plans(spark, names, suffix):
    import __spark_entry__ as em
    from forex_feature_generator_spark.ops import cache as opcache
    qs = em.queries()
    os.makedirs(PLAN_DIR, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = os.path.join(PLAN_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        opcache.release_all()
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["time", "plan", "all"])
    ap.add_argument("names", nargs="*")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()
    spark = _session()
    import __spark_entry__ as em
    names = args.names or list(em.queries())
    if args.cmd == "plan":
        dump_plans(spark, names, args.suffix)
    else:
        trials = 1 if args.cmd == "all" else args.trials
        res = time_queries(spark, names, trials)
        print(json.dumps({k: v["median"] for k, v in res.items()},
                         indent=1), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
