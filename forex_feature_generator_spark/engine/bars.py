"""Tumbling-window OHLC bar aggregation — Spark-first re-expression of
BarAggregator.cs:34-141 (see oracle/bars.py for the sequential semantics).

Plan shape (one shuffle on `source` for the tick-direction window, then a
partial-aggregated groupBy on (source, bar_ts) whose shuffle moves only bars):

  ticks --window lag(bid) over (source, seq)--> tick direction
        --groupBy(source, bar_ts): min_by/max_by/agg--> bars
        --window lead over (source, bar_ts)--> completion tick + last-bar drop

Reference semantics preserved:
  * bar_ts = integer floor of tick ts to the timeframe
  * up/down tick direction vs previous bid ACROSS bar boundaries; the very
    first tick of a source has no direction (_lastBid == 0 guard)
  * a bar is complete only when a later tick exists -> the final bar per
    source is dropped; `completion_seq`/`completion_ts` identify the tick
    that completed the bar (the first tick of the next bar) — this is the
    as-of key for the M5->M1 join and the label entry tick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_MIN = 60_000_000


def with_tick_direction(ticks: DataFrame) -> DataFrame:
    """Adds prev-bid up/down flags. `seq` is the per-source arrival order; use
    `with_seq` first if the input does not carry one."""
    w = Window.partitionBy("source").orderBy("seq")
    prev = F.lag("bid").over(w)
    return (
        ticks
        .withColumn("up_tick", (prev.isNotNull() & (F.col("bid") > prev)).cast("int"))
        .withColumn("down_tick", (prev.isNotNull() & (F.col("bid") < prev)).cast("int"))
    )


def with_seq(ticks: DataFrame) -> DataFrame:
    w = Window.partitionBy("source").orderBy("ts")
    return ticks.withColumn("seq", F.row_number().over(w) - F.lit(1))


def aggregate_bars(ticks_dir: DataFrame, tf_minutes: int) -> DataFrame:
    """ticks_dir: output of with_tick_direction. Returns COMPLETED bars:
    (source, bar_ts_us, open, high, low, close, tick_volume, up, down,
     avg_spread, max_spread, min_spread, first_seq, completion_seq,
     completion_ts_us, bar_index)."""
    tf_us = tf_minutes * US_PER_MIN
    # cast: accepts both session-tz TIMESTAMP and parquet TIMESTAMP_NTZ
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bar_ts = (us - (us % F.lit(tf_us))).alias("bar_ts_us")

    spread = F.col("ask") - F.col("bid")
    g = (
        ticks_dir
        .withColumn("bar_ts_us", bar_ts)
        .groupBy("source", "bar_ts_us")
        .agg(
            F.min_by("bid", "seq").alias("open"),
            F.max("bid").alias("high"),
            F.min("bid").alias("low"),
            F.max_by("bid", "seq").alias("close"),
            F.count(F.lit(1)).alias("tick_volume"),
            F.sum("up_tick").alias("up"),
            F.sum("down_tick").alias("down"),
            F.avg(spread).alias("avg_spread"),
            F.max(spread).alias("max_spread"),
            F.min(spread).alias("min_spread"),
            F.min("seq").alias("first_seq"),
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("first_ts_us"),
        )
    )
    w = Window.partitionBy("source").orderBy("bar_ts_us")
    g = (
        g
        .withColumn("completion_seq", F.lead("first_seq").over(w))
        .withColumn("completion_ts_us", F.lead("first_ts_us").over(w))
        .withColumn("bar_index", F.row_number().over(w) - F.lit(1))
        # final partial bar never completes (BarAggregator.cs:39-56)
        .filter(F.col("completion_seq").isNotNull())
        .drop("first_ts_us")
    )
    return g


def build_bars(ticks: DataFrame, timeframes=(1, 5)) -> dict[int, DataFrame]:
    """Both timeframes branch off one cached tick-direction DataFrame."""
    td = with_tick_direction(ticks)
    return {tf: aggregate_bars(td, tf) for tf in timeframes}
