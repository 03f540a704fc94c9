"""Bar aggregation oracle — transcription of
/root/reference/Core/Infrastructure/BarAggregator.cs:34-141 and
RollingWindow.cs:3-54.

Semantics reproduced exactly:
  * bar timestamp = integer floor of tick ts to the timeframe (ticks/tfTicks*tfTicks)
  * a bar completes only when a tick with a LATER bar time arrives; the final
    partial bar is never emitted
  * up/down tick volume: sign of bid vs previous bid, state crosses bar
    boundaries; the completing tick's direction counts toward the NEW bar
    (BarAggregator.cs:39-70)
  * OHLC on Bid; AvgSpread = plain mean of tick spreads within the bar
    (the reference's O(n^2) recompute is result-equivalent, BarAggregator.cs:104-111)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Bar:
    ts_us: int          # bar start, microseconds since epoch
    open: float
    high: float
    low: float
    close: float
    tick_volume: int
    up: int
    down: int
    avg_spread: float
    max_spread: float
    min_spread: float
    completion_idx: int = -1   # index of the tick that completed this bar

    @property
    def typical(self) -> float:
        return (self.high + self.low + self.close) / 3.0


class RollingWindow:
    """RollingWindow<T>: [0] = most recent (RollingWindow.cs:25-36)."""

    def __init__(self, size: int):
        self.size = size
        self.items: list = []

    def add(self, item):
        self.items.append(item)
        if len(self.items) > self.size:
            self.items.pop(0)

    def __getitem__(self, i):
        return self.items[len(self.items) - 1 - i]

    @property
    def count(self) -> int:
        return len(self.items)

    def values(self):
        """Most-recent-first, like GetValues()."""
        return list(reversed(self.items))


def floor_ts(ts_us: int, tf_us: int) -> int:
    return (ts_us // tf_us) * tf_us


def aggregate_bars(ts_us: np.ndarray, bid: np.ndarray, ask: np.ndarray,
                   tf_minutes: int) -> list[Bar]:
    """Sequential transcription of BarAggregator.AddTick over one source.

    Returns COMPLETED bars only (chronological), each with the index of the
    completing tick (the first tick whose bar time is later)."""
    tf_us = tf_minutes * 60_000_000
    completed: list[Bar] = []

    cur = None          # current bar dict
    cur_spreads: list[float] = []
    last_bid = 0.0
    up = 0
    down = 0

    n = len(ts_us)
    for i in range(n):
        t = int(ts_us[i])
        b = float(bid[i])
        spread = float(ask[i]) - b
        bar_time = floor_ts(t, tf_us)

        if cur is not None and bar_time > cur["ts_us"]:
            completed.append(
                Bar(
                    ts_us=cur["ts_us"], open=cur["open"], high=cur["high"],
                    low=cur["low"], close=cur["close"],
                    tick_volume=cur["tick_volume"], up=up, down=down,
                    avg_spread=float(np.mean(cur_spreads)),
                    max_spread=cur["max_spread"], min_spread=cur["min_spread"],
                    completion_idx=i,
                )
            )
            cur = None
            cur_spreads = []
            up = 0
            down = 0

        if last_bid > 0:
            if b > last_bid:
                up += 1
            elif b < last_bid:
                down += 1
        last_bid = b

        if cur is None:
            cur = dict(ts_us=bar_time, open=b, high=b, low=b, close=b,
                       tick_volume=1, max_spread=spread, min_spread=spread)
        else:
            cur["high"] = max(cur["high"], b)
            cur["low"] = min(cur["low"], b)
            cur["close"] = b
            cur["tick_volume"] += 1
            cur["max_spread"] = max(cur["max_spread"], spread)
            cur["min_spread"] = min(cur["min_spread"], spread)
        cur_spreads.append(spread)

    return completed
