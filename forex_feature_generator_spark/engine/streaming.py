"""Structured Streaming surface (SURVEY §2.9).

The reference is logically a stream program (lazy tick source, incremental
aggregators, bounded ring-buffer state, a 600-tick lookahead label). This
module provides the streaming equivalents of the batch operators:

  * streaming_bars   — tumbling M1/M5 OHLC with event-time watermark; a bar
    is only FINAL once the watermark passes its end, mirroring the
    batch rule "a bar completes when a later tick arrives"
    (BarAggregator.cs:39-56) with bounded state.
  * streaming_sessionize — gap-based sessions via F.session_window.
  * The feature/label kernels are batch-shaped by design; the streaming
    deployment runs them per micro-batch via foreachBatch over the FINAL
    bars (the 500-bar trailing window is carried by the snapshot table, see
    engine/snapshots.py). applyInPandasWithState is the fully-incremental
    alternative left for a later round.

All operators use event time only — no wall clock — so replaying a bounded
input through the stream gives bit-identical bars to the batch path
(tests/test_streaming.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_MIN = 60_000_000


def streaming_bars(ticks: DataFrame, tf_minutes: int,
                   watermark: str = "2 minutes") -> DataFrame:
    """ticks: a *streaming* DataFrame (source, ts, bid, ask). Emits completed
    bars in append mode once the watermark passes the window end.

    Note: up/down tick volume needs the previous tick's bid, which is a
    cross-row dependency not expressible in a pure streaming aggregation —
    the streaming surface emits OHLC/spread/volume; the direction columns
    come from the batch/foreachBatch path."""
    spread = F.col("ask") - F.col("bid")
    return (
        ticks
        .withWatermark("ts", watermark)
        .groupBy("source", F.window("ts", f"{tf_minutes} minutes").alias("w"))
        .agg(F.min_by("bid", "ts").alias("open"),
             F.max("bid").alias("high"),
             F.min("bid").alias("low"),
             F.max_by("bid", "ts").alias("close"),
             F.count(F.lit(1)).alias("tick_volume"),
             F.avg(spread).alias("avg_spread"),
             F.max(spread).alias("max_spread"),
             F.min(spread).alias("min_spread"))
        .select("source",
                F.unix_micros(F.col("w.start").cast("timestamp")).alias("bar_ts_us"),
                "open", "high", "low", "close", "tick_volume",
                "avg_spread", "max_spread", "min_spread")
    )


def streaming_sessionize(events: DataFrame, gap: str = "30 minutes",
                         watermark: str = "1 hour") -> DataFrame:
    """Gap-based session aggregation with session_window (north-rule
    sessionize, streaming form)."""
    return (
        events
        .withWatermark("ts", watermark)
        .groupBy("source", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"))
        .select("source", "session_start", "session_end", "n_events")
    )
