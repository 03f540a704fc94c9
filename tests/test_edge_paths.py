"""Guard-path parity: flat-price segments (zero candle range, zero sigma,
RSI avgLoss<1e-10 -> 100, entropy binWidth<1e-10 -> 0, SafeDiv defaults) and
dead-minute gaps (missing bars, sessionization edges) must match the oracle
bit-for-bit through the vectorized kernels."""

import numpy as np
import pandas as pd

from forex_feature_generator_spark import synth
from forex_feature_generator_spark.engine import features as efeat
from forex_feature_generator_spark.engine import labels as elab
from forex_feature_generator_spark.oracle import bars as obars
from forex_feature_generator_spark.oracle import pipeline as opipe
from tests.test_bars import oracle_bars_df
from tests.test_features_parity import LOOSE, RTOL, ATOL


def _weird_ticks() -> pd.DataFrame:
    ticks = synth.gen_ticks(n_sources=1, ticks_per_source=6000, hot_sources=0,
                            seed=31, mean_gap_s=6.0)
    ts = ticks["ts"].to_numpy().copy()
    bid = ticks["bid"].to_numpy().copy()
    ask = ticks["ask"].to_numpy().copy()
    # 1) flat-price plateau: ~100 minutes of constant bid/ask
    lo, hi = 2000, 3000
    bid[lo:hi] = bid[lo]
    ask[lo:hi] = bid[lo] + 1e-4
    # 2) dead gap: 30 empty minutes in the middle of the plateau region
    ts[2500:] = ts[2500:] + np.timedelta64(30, "m")
    # 3) second plateau right at the series end (partial-bar + label edges)
    bid[5800:] = bid[5800]
    ask[5800:] = bid[5800] + 2e-4
    out = ticks.copy()
    out["ts"] = ts
    out["bid"] = np.round(bid, 6)
    out["ask"] = np.round(ask, 6)
    return out


def test_flat_and_gappy_parity():
    ticks = _weird_ticks()
    oracle = opipe.run_multi_source(ticks)
    m1 = oracle_bars_df(ticks, 1)
    m5 = oracle_bars_df(ticks, 5)
    got = efeat.compute_features_pdf(m1, m5)

    o = oracle.sort_values("ts_us").reset_index(drop=True)
    g = got.sort_values("ts_us").reset_index(drop=True)
    assert len(o) == len(g) > 200
    assert (o["ts_us"].to_numpy() == g["ts_us"].to_numpy()).all()

    # Knife-edge carve-out: when a trailing window is BITWISE-FLAT, indicator
    # values are mathematically equal and strict branch comparisons
    # (ema9 > ema21, SafeDiv's 1e-10 guard on an exactly-zero ATR) become
    # functions of last-ulp summation order. The oracle reproduces C#'s
    # sequential sums; the vectorized engine sums pairwise — both are valid
    # float64 readings, so parity is only asserted on rows whose anchored
    # 64-bar window has non-zero price range (everything real data produces).
    m1s = m1.sort_values("bar_ts_us").reset_index(drop=True)
    close = m1s["close"].to_numpy()
    n = len(close)
    t_idx = np.arange(n)
    a1 = np.maximum(0, t_idx - 499)
    rng64 = np.array([
        close[a:min(a + 64, n)].max() - close[a:min(a + 64, n)].min()
        for a in a1])
    by_ts = dict(zip(m1s["bar_ts_us"].to_numpy(), rng64))
    keep = np.array([by_ts[t] > 0 for t in g["ts_us"].to_numpy()])
    assert keep.sum() > 150 and (~keep).sum() > 20   # both regimes exercised

    bad = []
    for c in opipe.FEATURE_NAMES:
        rtol, atol = LOOSE.get(c, (RTOL, ATOL))
        gv = g[c].to_numpy()[keep]
        ov = o[c].to_numpy()[keep]
        if not np.allclose(gv, ov, rtol=rtol, atol=atol):
            bad.append((c, float(np.nanmax(np.abs(gv - ov)))))
    assert not bad, bad
    # flat rows: discrete branches may flip on equal-value knife edges, but
    # values must still be finite and clipped
    flat = g[opipe.FEATURE_NAMES].to_numpy()[~keep]
    assert np.isfinite(flat).all() and np.abs(flat).max() <= 10.0

    # labels across the flat segment (activation never triggers -> neutral)
    g2 = ticks.sort_values("seq")
    ts_us = g2["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    m1o = obars.aggregate_bars(ts_us, g2.bid.to_numpy(), g2.ask.to_numpy(), 1)
    comp = {b.ts_us: b.completion_idx for b in m1o}
    entry = np.array([comp[t] for t in o.ts_us], dtype="int64")
    lab = elab.compute_labels(entry, g2.bid.to_numpy(), g2.ask.to_numpy())
    assert (lab == o["label"].to_numpy()).all()
