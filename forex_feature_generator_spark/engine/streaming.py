"""Structured Streaming surface (SURVEY §2.9).

The reference is logically a stream program (lazy tick source, incremental
aggregators, bounded ring-buffer state, a 600-tick lookahead label). This
module provides the streaming equivalents of the batch operators:

  * streaming_bars   — tumbling M1/M5 OHLC with event-time watermark; a bar
    is only FINAL once the watermark passes its end, mirroring the
    batch rule "a bar completes when a later tick arrives"
    (BarAggregator.cs:39-56) with bounded state.
  * streaming_bars_stateful — applyInPandasWithState per-source
    BarAggregator: carries the previous bid and the open partial bar across
    micro-batches, so bars complete EXACTLY when a later tick arrives
    (BarAggregator.cs:39-56 — not watermark-based) and the up/down tick
    direction survives bar AND batch boundaries (BarAggregator.cs:21-23,
    41-47). Replaying a bounded input yields bit-identical bars to the batch
    path including the direction columns (tests/test_streaming.py).
  * streaming_sessionize — gap-based sessions via F.session_window.
  * The feature/label kernels are batch-shaped by design; the streaming
    deployment runs them per micro-batch via foreachBatch over the FINAL
    bars (the 500-bar trailing window is carried by the snapshot table, see
    engine/snapshots.py).

All operators use event time only — no wall clock — so replaying a bounded
input through the stream gives bit-identical bars to the batch path
(tests/test_streaming.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

US_PER_MIN = 60_000_000

STREAM_BAR_SCHEMA = StructType([
    StructField("source", StringType()),
    StructField("bar_ts_us", LongType()),
    StructField("open", DoubleType()),
    StructField("high", DoubleType()),
    StructField("low", DoubleType()),
    StructField("close", DoubleType()),
    StructField("tick_volume", LongType()),
    StructField("up", LongType()),
    StructField("down", LongType()),
    StructField("avg_spread", DoubleType()),
    StructField("max_spread", DoubleType()),
    StructField("min_spread", DoubleType()),
])

# last_bid (NaN = no previous tick yet) + the open partial bar (bar_ts = -1 =
# none): bounded state, one row per source, exactly BarAggregator.cs fields
_STATE_SCHEMA = StructType([
    StructField("last_bid", DoubleType()),
    StructField("bar_ts", LongType()),
    StructField("open", DoubleType()),
    StructField("high", DoubleType()),
    StructField("low", DoubleType()),
    StructField("close", DoubleType()),
    StructField("vol", LongType()),
    StructField("up", LongType()),
    StructField("down", LongType()),
    StructField("sp_sum", DoubleType()),
    StructField("sp_max", DoubleType()),
    StructField("sp_min", DoubleType()),
])

_OUT_COLS = [f.name for f in STREAM_BAR_SCHEMA.fields]


def streaming_bars_stateful(ticks: DataFrame, tf_minutes: int) -> DataFrame:
    """Per-source incremental bar aggregation with custom state
    (applyInPandasWithState): a bar is emitted the moment a later tick
    arrives — the reference's completion rule — and the up/down direction
    uses the previous tick's bid across bar and micro-batch boundaries.
    Assumes per-source event-order delivery (the reference reads a
    sequential tick file); within a micro-batch rows are sorted by ts.
    Use outputMode('append')."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    tf_us = tf_minutes * US_PER_MIN

    def fn(key, pdfs, state: GroupState):
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks).sort_values("ts")
        us = pdf["ts"].to_numpy("datetime64[us]").astype("int64")
        bid = pdf["bid"].to_numpy("float64")
        ask = pdf["ask"].to_numpy("float64")
        bar_ts = us - us % tf_us
        if state.exists:
            st = state.get
            last_bid = st[0]
            carry = None if st[1] < 0 else list(st[1:])
        else:
            last_bid, carry = float("nan"), None

        prev = np.concatenate([[last_bid], bid[:-1]])
        finite_prev = ~np.isnan(prev)
        up = (finite_prev & (bid > prev)).astype("int64")
        down = (finite_prev & (bid < prev)).astype("int64")
        spread = ask - bid

        starts = np.flatnonzero(
            np.concatenate([[True], bar_ts[1:] != bar_ts[:-1]]))
        ends = np.append(starts[1:], len(bid))
        groups = []
        for s, e in zip(starts, ends):
            groups.append([int(bar_ts[s]), float(bid[s]),
                           float(bid[s:e].max()), float(bid[s:e].min()),
                           float(bid[e - 1]), int(e - s),
                           int(up[s:e].sum()), int(down[s:e].sum()),
                           float(spread[s:e].sum()), float(spread[s:e].max()),
                           float(spread[s:e].min())])
        if carry is not None:
            if groups and groups[0][0] == carry[0]:
                g = groups[0]
                groups[0] = [carry[0], carry[1], max(g[2], carry[2]),
                             min(g[3], carry[3]), g[4], g[5] + carry[5],
                             g[6] + carry[6], g[7] + carry[7],
                             g[8] + carry[8], max(g[9], carry[9]),
                             min(g[10], carry[10])]
            else:
                groups.insert(0, carry)
        done, new_carry = groups[:-1], groups[-1]
        state.update(tuple([float(bid[-1])] + new_carry))
        if done:
            src = key[0]
            yield pd.DataFrame(
                [[src, g[0], g[1], g[2], g[3], g[4], g[5], g[6], g[7],
                  g[8] / g[5], g[9], g[10]] for g in done],
                columns=_OUT_COLS)

    return (ticks.groupBy("source")
            .applyInPandasWithState(fn, STREAM_BAR_SCHEMA, _STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))


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
