"""Capture physical plans for the key operators -> PLANS.md.

For each plan we check the properties that matter at 100 TB:
  * parquet scans show ReadSchema pruned to the used columns and
    PushedFilters for predicates
  * the tick->bars path has ONE exchange on `source` feeding the window and
    partial-aggregated groupBys
  * the normalization select is a single ProjectExec inside
    WholeStageCodegen (no shuffle, stats folded to literals)
  * the as-of join is window-based (no nested-loop / row explosion)
  * the label join is a BroadcastHashJoin (150-col side never shuffled)

Run: python BENCH/capture_plans.py
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def explain_str(df, mode="formatted", max_lines=60) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    lines = buf.getvalue().splitlines()
    if len(lines) > max_lines:
        lines = lines[:max_lines] + [f"... (+{len(lines) - max_lines} lines)"]
    return "\n".join(lines)


def main() -> None:
    from pyspark.sql import functions as F
    from forex_feature_generator_spark import synth
    from forex_feature_generator_spark.engine import bars as ebars
    from forex_feature_generator_spark.engine import normalize as enorm
    from forex_feature_generator_spark.engine import pipeline as epipe
    from forex_feature_generator_spark.engine import windows as WIN
    from forex_feature_generator_spark.engine.session import get_spark
    import __spark_entry__ as em

    spark = get_spark("plans", master="local[4]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.001"
    sections: list[tuple[str, str, str]] = []

    ev = spark.read.parquet(f"{sf}/events.parquet")

    # 1. pruning + pushdown
    q = (ev.filter(F.col("event_type") == "purchase")
         .select("event_id", "value"))
    sections.append((
        "Parquet pruning + predicate pushdown",
        "Scan must show ReadSchema with only (event_id, event_type, value) "
        "and PushedFilters for event_type.",
        explain_str(q)))

    # 2. bars plan
    ticks = spark.createDataFrame(
        synth.gen_ticks(n_sources=2, ticks_per_source=2000, hot_sources=0))
    bars = ebars.aggregate_bars(ebars.with_tick_direction(ticks), 1)
    sections.append((
        "Tick -> M1 bars",
        "One exchange on `source` for the lag window; the groupBy emits "
        "partial aggregates map-side (HashAggregate before the exchange on "
        "(source, bar_ts_us)); completion window reuses source partitioning.",
        explain_str(bars)))

    # 3. as-of join — no row explosion
    quotes = (ev.groupBy("event_type", F.date_trunc("minute", "ts").alias("minute"))
              .agg(F.avg("value").alias("ref_value"))
              .withColumn("minute_end", F.col("minute") + F.expr("interval 1 minute")))
    asof = WIN.asof_join_backward(ev, quotes, ["event_type"], "ts", "minute_end",
                                  ["ref_value"])
    sections.append((
        "Sorted-merge as-of join (union + forward-fill window)",
        "No join operator at all: Union + one Window over event_type — the "
        "only exchange is the hash partition on the `by` key. DuckDB oracle: "
        "ASOF JOIN.",
        explain_str(asof)))

    # 4. feature pipeline end-to-end plan (broadcast label join)
    out = epipe.run_pipeline(spark, ticks, cache_ticks=False)
    sections.append((
        "Feature pipeline (cogroup kernels + broadcast label join)",
        "FlatMapCoGroupsInPandas for the feature and label kernels; the final "
        "join is BroadcastHashJoin with the 3-column label side broadcast — "
        "the 150-column feature side is never re-shuffled.",
        explain_str(out, max_lines=80)))

    # 5. normalization — single codegen stage
    stats = enorm.compute_stats(out.limit(50))
    norm = enorm.normalize(out, stats)
    sections.append((
        "Broadcast-stats normalization",
        "A single Project over the feature table: the 148 scalers are "
        "constant-folded literal expressions, whole-stage codegen, no shuffle.",
        explain_str(norm, max_lines=40)))

    with open(os.path.join(ROOT, "PLANS.md"), "w") as f:
        f.write("# PLANS — physical-plan review of the key operators\n\n"
                "Captured by `python BENCH/capture_plans.py` "
                "(local[4], sf0.001 + tiny synthetic ticks).\n")
        for title, why, plan in sections:
            f.write(f"\n## {title}\n\n{why}\n\n```\n{plan}\n```\n")
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
