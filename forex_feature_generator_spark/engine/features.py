"""Per-source feature assembly + the Spark cogroup kernel.

One Arrow batch per source (cogrouped M1/M5 bars) -> numpy anchored arrays
(engine/kernels.py) -> emission-state series over the M1-emission axis ->
148 pinned columns, scrubbed and clipped.

The M5->M1 as-of join is a sorted-merge searchsorted on the bar-completion
tick sequence — the M5 bar set visible at an M1 emission is exactly the bars
whose completing tick is <= the M1 bar's completing tick
(BarAggregator.cs:39-56 + FeaturePipeline.cs:126-133 semantics).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..oracle.pipeline import FEATURE_NAMES, DOTNET_EPOCH_TICKS
from . import kernels as K

WARMUP_BARS = 260
WINDOW = 500


def _sigmoid_s(x):
    return 2.0 / (1.0 + np.exp(-np.asarray(x, dtype="float64"))) - 1.0


def _rolling_slope10(x: np.ndarray) -> np.ndarray:
    """OLS slope of each trailing chronological 10-window [r-9..r] (x index)."""
    W = np.lib.stride_tricks.sliding_window_view(
        np.concatenate([np.full(9, np.nan), x]), 10)
    xs = np.arange(10.0)
    sx, sx2, n = xs.sum(), (xs ** 2).sum(), 10.0
    sy = W.sum(axis=1)
    sxy = (W * xs).sum(axis=1)
    return K.safe_div(n * sxy - sx * sy, n * sx2 - sx * sx)


def _momentum_quality_5(h: np.ndarray) -> np.ndarray:
    """CalculateMomentumQuality over [h[t], h[t-1], ..., h[t-4]] per t."""
    n = len(h)
    hp = np.concatenate([np.full(4, np.nan), h])
    W = np.lib.stride_tricks.sliding_window_view(hp, 5)  # cols: h[t-4..t]
    vals = W[:, ::-1]                                     # values[0]=h[t] ...
    ref = np.sign(vals[:, 0] - vals[:, 1])
    D = np.sign(vals[:, 1:] - vals[:, :-1])               # values[j]-values[j-1]
    return (D == ref[:, None]).sum(axis=1) / 4.0


def _shift(x: np.ndarray, k: int) -> np.ndarray:
    if k == 0:
        return x
    return np.concatenate([np.full(k, np.nan), x[:-k]])


def compute_features_pdf(m1: pd.DataFrame, m5: pd.DataFrame,
                         warmup_bars: int = WARMUP_BARS,
                         bar_index_offset: int = 0,
                         m5_index_offset: int = 0) -> pd.DataFrame:
    """m1/m5: per-source completed-bar frames from engine/bars.py.
    Returns emitted rows: (source, ts_us, timestamp, completion_seq,
    bar_index, <148 features>).

    The offsets support halo-chunked execution (engine/skew.py): the local
    frames are a contiguous global slice; every absolute gate (warm-up,
    emission-state run counts, anchored indices) uses the GLOBAL bar index.
    Halo rows near the local start may compute garbage (negative local
    anchors) — callers must drop rows below their emit boundary."""
    empty_cols = (["source", "ts_us", "timestamp", "completion_seq",
                   "bar_index"] + FEATURE_NAMES)
    if bar_index_offset + len(m1) <= warmup_bars or len(m5) == 0:
        return pd.DataFrame({c: pd.Series(dtype="float64") for c in empty_cols})

    m1 = m1.sort_values("bar_ts_us").reset_index(drop=True)
    m5 = m5.sort_values("bar_ts_us").reset_index(drop=True)
    n1 = len(m1)

    a_m1 = K.anchored_m1(
        m1["open"].to_numpy("float64"), m1["high"].to_numpy("float64"),
        m1["low"].to_numpy("float64"), m1["close"].to_numpy("float64"),
        m1["tick_volume"].to_numpy("int64"), m1["up"].to_numpy("int64"),
        m1["down"].to_numpy("int64"), m1["avg_spread"].to_numpy("float64"))
    a_m5 = K.anchored_m5(
        m5["open"].to_numpy("float64"), m5["high"].to_numpy("float64"),
        m5["low"].to_numpy("float64"), m5["close"].to_numpy("float64"),
        m5["tick_volume"].to_numpy("int64"), m5["up"].to_numpy("int64"),
        m5["down"].to_numpy("int64"), m5["avg_spread"].to_numpy("float64"),
        m5["bar_ts_us"].to_numpy("int64"))

    # --- sorted-merge as-of: visible M5 count per M1 emission (GLOBAL) ---
    m1_comp = m1["completion_seq"].to_numpy("int64")
    m5_comp = m5["completion_seq"].to_numpy("int64")
    m5c = m5_index_offset + np.searchsorted(m5_comp, m1_comp, side="right")

    t = bar_index_offset + np.arange(n1)          # global bar index
    a1 = np.maximum(0, t - (WINDOW - 1)) - bar_index_offset   # local anchor
    ci5 = np.minimum(m5c - 1, WINDOW - 1)
    a5 = np.maximum(0, m5c - WINDOW) - m5_index_offset        # local anchor

    emitted = t >= warmup_bars
    if not emitted.any():
        return pd.DataFrame({c: pd.Series(dtype="float64") for c in empty_cols})
    if (m5c[emitted] < 51).any():
        # C# would throw the 148-feature assert (Program.cs:269-272)
        raise AssertionError("M5 history < 51 bars at an emitted row")

    feats: dict[str, np.ndarray] = {}

    # --- anchored M1 features, indexed at a1 ---
    for name, arr in a_m1.items():
        if not name.startswith("_"):
            feats[name] = arr[a1]

    # --- anchored M5 features, indexed at a5 ---
    for name, arr in a_m5.items():
        if not name.startswith("_"):
            feats[name] = arr[a5]

    # --- currentIndex-dependent trio (M5 emission clock) ---
    feats["02_cyclical_phase"] = np.sin(((ci5 % 20) / 20.0) * 2 * np.pi)
    angle = ci5 / math.pow(10000, 2.0 / 64)
    feats["06_dl_pos_encoding_sin"] = np.sin(angle)
    feats["06_dl_pos_encoding_cos"] = np.cos(angle)

    # ================= emission-state features =================
    # Technical (runs when M1 ci >= 50 -> t >= 50); histories over run axis.
    tech_start = 50
    rsi_em = a_m1["_rsi14"][a1]           # value per emission t
    macd_em = a_m1["_macd_hist"][a1]
    run_idx_tech = t - tech_start          # history count after add = run_idx+1
    rsi_mom = np.where(
        run_idx_tech >= 4,
        _sigmoid_s(((rsi_em - _shift(rsi_em, 4)) / 5) / 10), 0.0)
    feats["04_tech_rsi_momentum"] = rsi_mom
    feats["04_tech_macd_quality"] = np.where(
        run_idx_tech >= 4, _momentum_quality_5(macd_em), 0.0)

    # Microstructure (runs t >= 49)
    micro_start = 49
    nf_em = a_m1["_net_flow"][a1]
    sb_em = a_m1["_spread_bps"][a1]
    run_idx_micro = t - micro_start
    f2 = _shift(nf_em, 1)
    f3 = _shift(nf_em, 2)
    feats["03_micro_flow_acceleration"] = np.where(
        run_idx_micro >= 3,                     # count(before add) >= 3
        _sigmoid_s(((nf_em - f2) - (f2 - f3)) / 100), 0.0)
    Wsb = np.lib.stride_tricks.sliding_window_view(
        np.concatenate([np.full(19, np.nan), sb_em]), 20)
    sb_mean = Wsb.mean(axis=1)
    sb_std = np.sqrt(((Wsb - sb_mean[:, None]) ** 2).mean(axis=1))
    feats["03_micro_spread_zscore"] = np.where(
        run_idx_micro >= 19,                    # count(after add) >= 20
        np.where(sb_std < 1e-10, 0.0,
                 (sb_em - sb_mean) / np.where(sb_std < 1e-10, 1.0, sb_std)),
        0.0)

    # Regime (runs when m5c >= 51): run axis r
    reg_ran = m5c >= 51
    r_t = t[reg_ran]
    vol20_r = a_m5["_rv20"][a5[reg_ran]]
    rtype_r = a_m5["_regime_type_int"][a5[reg_ran]]
    nr = len(r_t)
    r_idx = np.arange(nr)
    # vol trend: count AFTER add >= 10 -> r_idx >= 9
    vol_trend_r = np.where(r_idx >= 9, _sigmoid_s(_rolling_slope10(vol20_r) * 1000), 0.0)
    # duration: 1 + (length of the run of entries == current type immediately
    # before r, walked most-recent-first through the 100-deep ring)
    change = np.concatenate([[True], rtype_r[1:] != rtype_r[:-1]])
    run_start = np.flatnonzero(change)[np.cumsum(change) - 1]   # start idx of each run
    same_as_prev = ~change
    duration_r = np.where(same_as_prev,
                          1.0 + np.minimum(r_idx - run_start, 100), 1.0)
    # stability: population variance of the previous min(20, r) types
    prev_types = _shift(rtype_r.astype("float64"), 1)
    Wt = np.lib.stride_tricks.sliding_window_view(
        np.concatenate([np.full(19, np.nan), prev_types]), 20)
    fin = np.isfinite(Wt)
    cnt = fin.sum(axis=1)
    tm = np.where(fin, Wt, 0.0).sum(axis=1) / np.maximum(cnt, 1)
    tvar = (np.where(fin, (Wt - tm[:, None]) ** 2, 0.0)).sum(axis=1) / np.maximum(cnt, 1)
    stability_r = np.where(r_idx == 0, 0.5, 1.0 / (1.0 + np.sqrt(tvar)))
    dur_feat = np.zeros(n1)
    stab_feat = np.full(n1, 0.0)
    vt_feat = np.zeros(n1)
    dur_feat[reg_ran] = _sigmoid_s(duration_r / 20.0)
    stab_feat[reg_ran] = stability_r
    vt_feat[reg_ran] = vol_trend_r
    feats["02_regime_duration_norm"] = dur_feat
    feats["02_regime_stability"] = stab_feat
    feats["02_vol_trend"] = vt_feat

    # ML (runs when m5c >= 50): run axis q
    ml_ran = m5c >= 50
    q_t = t[ml_ran]
    nq = len(q_t)
    q_idx = np.arange(nq)
    close_q = a_m5["_close"][a5[ml_ran]]
    vol_q = a_m5["_vol"][a5[ml_ran]]
    # volume short/long ratio: history BEFORE add (prev 5 / prev 20), count >= 20
    vprev = _shift(vol_q, 1)
    W5 = np.lib.stride_tricks.sliding_window_view(
        np.concatenate([np.full(4, np.nan), vprev]), 5)
    W20 = np.lib.stride_tricks.sliding_window_view(
        np.concatenate([np.full(19, np.nan), vprev]), 20)
    vol5 = W5.mean(axis=1)
    vol20m = W20.mean(axis=1)
    ratio_q = np.where(q_idx >= 20, K.safe_div(vol5, vol20m), 0.0)
    # percentile vs previous 50
    cprev = _shift(close_q, 1)
    Wc50 = np.lib.stride_tricks.sliding_window_view(
        np.concatenate([np.full(49, np.nan), cprev]), 50)
    p_rank = (Wc50 < close_q[:, None]).sum(axis=1) / 50.0
    price_pct_q = np.where(q_idx >= 50, p_rank, 0.5)
    Wv50e = np.lib.stride_tricks.sliding_window_view(
        np.concatenate([np.full(49, np.nan), _shift(vol_q, 1)]), 50)
    v_rank = (Wv50e < vol_q[:, None]).sum(axis=1) / 50.0
    vol_pct_q = np.where(q_idx >= 50, v_rank, 0.5)
    # market quality volume-consistency term (previous 20 emission volumes)
    Wv20e = np.lib.stride_tricks.sliding_window_view(
        np.concatenate([np.full(19, np.nan), vprev]), 20)
    vmean_e = Wv20e.mean(axis=1)
    vstd_e = np.sqrt(((Wv20e - vmean_e[:, None]) ** 2).mean(axis=1))
    vstd_e = np.where(q_idx >= 20, vstd_e, 0.0)
    vroll_mean = a_m5["_ml_volume_rolling_mean"][a5[ml_ran]]
    consistency = 1.0 - np.minimum(1.0, K.safe_div(vstd_e, vroll_mean))
    spread_term = a_m5["_ml_spread_quality"][a5[ml_ran]]
    quality_q = (consistency + spread_term + 0.0) / 3.0

    def scatter_q(vals, default):
        outv = np.full(n1, default, dtype="float64")
        outv[ml_ran] = vals
        return outv

    feats["07_ml_volume_short_long_ratio"] = scatter_q(ratio_q, 0.0)
    feats["07_ml_price_percentile_50"] = scatter_q(price_pct_q, 0.5)
    feats["07_ml_volume_percentile_50"] = scatter_q(vol_pct_q, 0.5)
    feats["07_ml_market_quality_score"] = scatter_q(quality_q, 0.5)

    # ================= assemble, scrub, clip =================
    sel = emitted
    data = {}
    for name in FEATURE_NAMES:
        v = np.asarray(feats[name], dtype="float64")[sel]
        v = np.where(np.isfinite(v), v, 0.0)          # AddFeature hygiene
        v = np.where(np.abs(v) > 10, np.sign(v) * 10.0, v)  # ValidateFeatures clip
        data[name] = v

    out = pd.DataFrame(data)
    out.insert(0, "source", m1["source"].to_numpy()[sel])
    out.insert(1, "ts_us", m1["bar_ts_us"].to_numpy("int64")[sel])
    out.insert(2, "timestamp", DOTNET_EPOCH_TICKS + m1["bar_ts_us"].to_numpy("int64")[sel] * 10)
    out.insert(3, "completion_seq", m1["completion_seq"].to_numpy("int64")[sel])
    out.insert(4, "bar_index", t[sel])
    return out
