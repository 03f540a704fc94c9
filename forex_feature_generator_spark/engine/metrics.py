"""Per-partition lineage + row/sec metrics (SURVEY §4.5).

Two complementary surfaces:
  * partition_lineage(df)  — one row per physical partition with row counts
    (cheap: spark_partition_id + partial-agg groupBy); persisted into the
    snapshot manifests by engine/snapshots.py
  * Instrument(df)         — accumulator-backed row counter + wall-time via
    an Arrow mapInPandas pass-through; read totals on the driver after an
    action (the executors-to-driver metric channel that ProgressReporter.cs
    provides in the reference)
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_lineage(df: DataFrame) -> DataFrame:
    return (df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows")))


class Instrument:
    """Pass-through instrumentation: `inst = Instrument(df); out = inst.df`
    then after an action on `out`, `inst.rows.value` / `inst.batch_ms.value`
    hold totals across all executors."""

    def __init__(self, df: DataFrame, name: str = "instrument"):
        sc = df.sparkSession.sparkContext
        self.rows = sc.accumulator(0)
        self.batches = sc.accumulator(0)
        self.batch_ms = sc.accumulator(0)
        rows_acc, batches_acc, ms_acc = self.rows, self.batches, self.batch_ms

        def passthrough(batches_it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches_it:
                t0 = time.time()
                rows_acc.add(len(pdf))
                batches_acc.add(1)
                yield pdf
                ms_acc.add(int((time.time() - t0) * 1000))

        self.df = df.mapInPandas(passthrough, schema=df.schema)


def format_timespan(seconds: float) -> str:
    """ProgressReporter.FormatTimeSpan (Utilities/ProgressReporter.cs:57-66):
    negative -> 'calculating...', <1m -> 'Ss', <1h -> 'Mm Ss', else 'Hh Mm'."""
    if seconds < 0:
        return "calculating..."
    s = int(seconds)
    if s < 60:
        return f"{s}s"
    if s < 3600:
        return f"{s // 60}m {s % 60}s"
    return f"{s // 3600}h {(s % 3600) // 60}m"


class ProgressReporter:
    """Driver-side percent/ETA ticks over a known item total — the surface
    of Utilities/ProgressReporter.cs:13-55 (start line, every
    `report_interval` percent a line with N/total, items/sec and ETA, and a
    completion summary). Feed it from accumulator totals (Instrument) or a
    streaming query's progress callbacks; `emit` defaults to print."""

    def __init__(self, task_name: str, total_items: int,
                 report_interval: int = 10, emit=print, clock=time.time):
        self.task_name = task_name
        self.total = max(1, total_items)
        self.interval = report_interval
        self.emit = emit
        self.clock = clock
        self.t0 = clock()
        self.last_pct = 0
        emit(f"  Starting: {task_name} ({total_items:,} items)")

    def update(self, current_item: int) -> None:
        pct = int((current_item + 1) * 100.0 / self.total)
        if pct >= self.last_pct + self.interval or pct == 100:
            self.last_pct = pct
            elapsed = self.clock() - self.t0
            done = current_item + 1
            rate = done / elapsed if elapsed > 0 else float("inf")
            remaining = self.total / rate - elapsed if rate > 0 else -1.0
            self.emit(f"    {pct}% complete - {done:,}/{self.total:,} items - "
                      f"{rate:.0f} items/sec - ETA: {format_timespan(remaining)}")

    def complete(self) -> None:
        total_time = self.clock() - self.t0
        rate = self.total / total_time if total_time > 0 else float("inf")
        self.emit(f"  ✓ Completed: {self.task_name}")
        self.emit(f"    Total time: {format_timespan(total_time)} - "
                  f"Average: {rate:.1f} items/sec")
