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
