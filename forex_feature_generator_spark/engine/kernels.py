"""Vectorized numpy kernels for the 148 features.

KEY INSIGHT (SURVEY §2.0.1): every calculator anchors on the OLDEST bar of its
trailing min(500, count)-bar window, and `bars[currentIndex - k]` is the bar k
steps FORWARD (chronologically later) from that anchor.  All formulas read at
most C[0..63] — the first 64 bars from the anchor.  Therefore every bar-window
feature can be computed as a vectorized array over the anchor index i (forward
windows arr[i:i+w]), and the per-emission value is just that array indexed at
anchor a = max(0, t-499):

  * t in [warmup, 498]  (growing window): anchor 0, all guards pass since
    currentIndex = t >= 260 >= every gate threshold -> feature constant.
  * t >= 499 (full window): anchor slides, currentIndex == 499 constant.

The only non-anchored terms are the per-emission ring-buffer features
(handled in features.py over the emission axis) and the currentIndex-dependent
trio (02_cyclical_phase, 06_dl_pos_encoding_sin/cos).

No temporal leakage: for every emission the anchored read a+63 < t (full) or
<= t (growing, t >= warmup) — verified by tests/test_leakage.py.

All arrays are float64; division by zero follows IEEE (matches C# doubles);
min/max use NaN-propagating np.minimum/np.maximum like Math.Min/Max.

Known knife edge (tests/test_edge_paths.py): on BITWISE-FLAT trailing windows
the discrete branch features (EMA-stack alignments, SafeDiv's 1e-10 guard on
an exactly-zero ATR) depend on last-ulp summation order; the oracle matches
C#'s sequential sums while these kernels sum pairwise. Real tick data never
produces exactly-constant 64-bar windows; on such windows values remain
finite/clipped and non-flat rows keep full parity.
"""

from __future__ import annotations

import numpy as np

np.seterr(all="ignore")

W_M1 = 64   # max forward read on the M1 axis (vol_percentile: d=49 + ATR14)
W_M5 = 51   # max forward read on the M5 axis (hurst / realized-vol 50)


# ---------------------------------------------------------------- helpers

def _wv(x: np.ndarray, w: int) -> np.ndarray:
    """Forward sliding windows with NaN tail-padding: out[i] = x[i:i+w]."""
    xp = np.concatenate([np.asarray(x, dtype="float64"),
                         np.full(w - 1, np.nan)])
    return np.lib.stride_tricks.sliding_window_view(xp, w)[: len(x)]


def fsum(x, p):
    return _wv(x, p).sum(axis=1)


def fmean(x, p):
    return _wv(x, p).mean(axis=1)


def fvar_pop(x, p):
    """Two-pass population variance (matches the C# mean-then-sum-squares)."""
    w = _wv(x, p)
    m = w.mean(axis=1)
    return ((w - m[:, None]) ** 2).mean(axis=1)


def safe_div(num, den, default=0.0):
    """BaseCalculator.SafeDiv, vectorized."""
    num = np.asarray(num, dtype="float64")
    den = np.asarray(den, dtype="float64")
    bad = (np.abs(den) < 1e-10) | np.isnan(den)
    r = np.where(bad, np.nan, num) / np.where(bad, 1.0, den)
    r = np.where(bad | np.isnan(r) | np.isinf(r), default, r)
    return r


def sigmoid(x, steepness=1.0):
    return 2.0 / (1.0 + np.exp(-steepness * np.asarray(x, dtype="float64"))) - 1.0


def zscore(v, mean, std):
    return np.where(std < 1e-10, 0.0, (v - mean) / np.where(std < 1e-10, 1.0, std))


def strict_rank_pct(target, w):
    """CalculatePercentileRank: count(v < target)/n*100 over window rows."""
    return (w < target[:, None]).sum(axis=1) / w.shape[1] * 100.0


def sgn(x):
    return np.sign(x)


# ---------------------------------------------------------------- M1 kernels

def anchored_m1(open_, high, low, close, vol, up, down, avg_spread):
    """All M1 anchored feature arrays, indexed by anchor i (length n).
    Values past n - W_M1 are NaN-contaminated and must not be read."""
    n = len(close)
    out = {}

    nxt = np.concatenate([close[1:], [np.nan]])
    rd = close - nxt                       # rd[g] = C-diff (C[d] - C[d+1]) at g
    abs_rd = np.abs(rd)
    hd = high - np.concatenate([high[1:], [np.nan]])      # high[g]-high[g+1]
    ld = np.concatenate([low[1:], [np.nan]]) - low        # low[g+1]-low[g]
    tr = np.maximum(high - low,
                    np.maximum(np.abs(high - nxt), np.abs(low - nxt)))
    atr14 = fmean(tr, 14)
    atr7 = fmean(tr, 7)

    # --- Directional ---
    for p, nm in ((5, "01_dir_momentum_z5"), (10, "01_dir_momentum_z10")):
        momp = close - np.concatenate([close[p:], np.full(p, np.nan)])
        m31 = _wv(momp, 31)
        mean = m31.mean(axis=1)
        std = np.sqrt(((m31 - mean[:, None]) ** 2).mean(axis=1))
        out[nm] = zscore(momp, mean, std)

    c5 = close - np.concatenate([close[5:], np.full(5, np.nan)])
    m1_ = c5
    m2_ = np.concatenate([c5[5:], np.full(5, np.nan)])
    m3_ = np.concatenate([c5[10:], np.full(10, np.nan)])
    out["01_dir_momentum_accel"] = sigmoid(((m1_ - m2_) - (m2_ - m3_)) * 10000)

    S = _wv(rd, 10)
    ref = sgn(S[:, 9] - S[:, 8])
    D = sgn(S[:, :-1] - S[:, 1:])          # D[:,k] = sign(rd[a+k]-rd[a+k+1])
    out["01_dir_momentum_quality"] = (D == ref[:, None]).sum(axis=1) / 9.0

    cd = _candle_direction(open_, high, low, close)
    out["01_dir_candle_direction"] = cd
    cd1 = np.concatenate([cd[1:], [np.nan]])
    cd2 = np.concatenate([cd[2:], [np.nan, np.nan]])
    out["01_dir_pattern_strength"] = sigmoid((3 * cd2 + 2 * cd1 + cd) / 6)

    hh = _wv(high, 20).max(axis=1)
    ll = _wv(low, 20).min(axis=1)
    rng = hh - ll
    out["01_dir_price_position"] = np.where(
        rng < 1e-10, 0.0, 2 * (close - ll) / np.where(rng < 1e-10, 1.0, rng) - 1)

    tot_ud = up + down
    out["01_dir_volume_direction"] = np.where(tot_ud < 1e-10, 0.0,
                                              (up - down) / np.where(tot_ud == 0, 1.0, tot_ud))

    pc = close - open_
    buy_c = np.where(pc > 0, vol * np.abs(pc), 0.0)
    sell_c = np.where(pc > 0, 0.0, vol * np.abs(pc))
    B = fsum(buy_c, 10)
    Sp = fsum(sell_c, 10)
    tot = B + Sp
    out["01_dir_volume_pressure"] = np.where(tot < 1e-10, 0.0,
                                             (B - Sp) / np.where(tot == 0, 1.0, tot))

    Wr = _wv(rd, 10)
    Wvol = _wv(vol, 10)
    ap = Wr.mean(axis=1)
    av = Wvol.mean(axis=1)
    dr = Wr - ap[:, None]
    dv = Wvol - av[:, None]
    out["01_dir_vol_mom_correlation"] = safe_div(
        (dr * dv).sum(axis=1), np.sqrt((dr ** 2).sum(axis=1) * (dv ** 2).sum(axis=1)))

    dm = np.maximum(0.0, np.maximum(hd, ld))
    out["01_dir_trend_strength"] = np.minimum(1.0, safe_div(fsum(dm, 14), fsum(tr, 14)))

    dmp = np.where((hd > ld) & (hd > 0), hd, 0.0)
    dmm = np.where((ld > hd) & (ld > 0), ld, 0.0)
    st14 = fsum(tr, 14)
    out["01_dir_dm_plus"] = safe_div(fsum(dmp, 14), st14)
    out["01_dir_dm_minus"] = safe_div(fsum(dmm, 14), st14)

    c10 = np.concatenate([close[10:], np.full(10, np.nan)])
    out["01_dir_trend_efficiency"] = safe_div(np.abs(close - c10), fsum(abs_rd, 10))

    sma20 = fmean(close, 20)
    nd = safe_div(close - sma20, atr14)
    out["01_dir_mean_reversion_prob"] = np.where(
        np.abs(nd) > 2, -sgn(nd) * np.minimum(1.0, np.abs(nd) / 3), 0.0)

    # --- Technical ---
    def rsi(p):
        g = fsum(np.where(rd > 0, rd, 0.0), p) / p
        l = fsum(np.where(rd > 0, 0.0, np.abs(rd)), p) / p
        rs = g / np.where(l < 1e-10, 1.0, l)
        return np.where(l < 1e-10, 100.0, 100.0 - 100.0 / (1.0 + rs))

    rsi14 = rsi(14)
    out["_rsi14"] = rsi14                      # emission-state input
    out["04_tech_rsi_normalized"] = (rsi14 - 50) / 50
    rsi9 = rsi(9)
    rsi21 = rsi(21)
    out["04_tech_rsi_composite"] = (rsi9 * 0.3 + rsi14 * 0.4 + rsi21 * 0.3 - 50) / 50

    ema12 = fmean(close, 12)
    ema26 = fmean(close, 26)
    macd_line = ema12 - ema26
    macd_signal = fmean(macd_line, 9)
    macd_hist = macd_line - macd_signal
    out["_macd_hist"] = macd_hist              # emission-state input
    out["04_tech_macd_normalized"] = sigmoid(safe_div(macd_hist, atr14))

    bb_mid = fmean(close, 20)
    bb_std = np.sqrt(fvar_pop(close, 20))
    bb_width = 4 * bb_std                      # (mid+2s)-(mid-2s)
    out["04_tech_bb_position"] = safe_div(close - (bb_mid - 2 * bb_std), bb_width) * 2 - 1
    Wd = _wv(bb_width, 20)
    out["04_tech_bb_squeeze"] = (strict_rank_pct(bb_width, Wd) < 20).astype("float64")
    w5 = np.concatenate([bb_width[5:], np.full(5, np.nan)])
    out["04_tech_bb_expansion"] = sigmoid(safe_div(bb_width - w5, w5) * 100)

    ema9 = fmean(close, 9)
    ema21 = fmean(close, 21)
    ema50 = fmean(close, 50)
    out["04_tech_ma_alignment"] = _ma_alignment(close, ema9, ema21, ema50)
    out["04_tech_ma_dev_9"] = sigmoid(safe_div(close - ema9, atr14))
    out["04_tech_ma_dev_21"] = sigmoid(safe_div(close - ema21, atr14))

    s1 = np.abs(ema9 - ema21)
    s2 = np.abs(ema21 - ema50)
    p9 = np.concatenate([ema9[5:], np.full(5, np.nan)])
    p21 = np.concatenate([ema21[5:], np.full(5, np.nan)])
    p50 = np.concatenate([ema50[5:], np.full(5, np.nan)])
    ps1 = np.abs(p9 - p21)
    ps2 = np.abs(p21 - p50)
    out["04_tech_ma_convergence"] = sigmoid(
        (safe_div(ps1 - s1, ps1) + safe_div(ps2 - s2, ps2)) * 50)

    out["04_tech_atr_ratio"] = safe_div(atr7, atr14)
    Watr = _wv(atr14, 50)
    out["04_tech_vol_percentile"] = strict_rank_pct(atr14, Watr) / 100.0

    # --- Microstructure (anchored part) ---
    net_flow = (up - down).astype("float64")
    out["_net_flow"] = net_flow                # emission-state input
    out["03_micro_flow_imbalance"] = np.where(tot_ud > 0, net_flow / np.where(tot_ud == 0, 1, tot_ud), 0.0)
    out["03_micro_buy_pressure"] = np.where(up > 0, up / np.maximum(1, vol), 0.0)
    out["03_micro_sell_pressure"] = np.where(down > 0, down / np.maximum(1, vol), 0.0)
    out["03_micro_pressure_diff"] = out["03_micro_buy_pressure"] - out["03_micro_sell_pressure"]

    avg_vol19 = fmean(vol, 19)                 # mean over C[d..d+18]
    prev19 = np.concatenate([avg_vol19[1:], [np.nan]])   # C[1..19]
    spike_ratio = safe_div(vol, prev19)
    spike = np.where(spike_ratio > 2.0, 1.0, np.where(spike_ratio > 1.5, 0.5, 0.0))
    out["03_micro_volume_spike"] = spike
    out["03_micro_spike_direction"] = spike * sgn(net_flow)

    spread_bps = avg_spread * 10000 / close
    out["_spread_bps"] = spread_bps            # emission-state input
    out["03_micro_spread_volume_ratio"] = sigmoid(
        safe_div(spread_bps, np.log(1 + vol)) - 1)

    rates = vol / 60.0
    Wrate = _wv(rates, 20)
    out["03_micro_tick_intensity"] = (strict_rank_pct(rates, Wrate) - 50) / 50
    out["03_micro_tick_direction"] = np.where(vol > 0, (up - down) / np.where(vol == 0, 1, vol), 0.0)

    recent = fsum(vol, 3)
    total10 = fsum(vol, 10)
    out["03_micro_tick_clustering"] = np.where(
        total10 > 0, (recent / np.where(total10 == 0, 1, total10) - 0.3) / 0.7, 0.0)

    typical = (high + low + close) / 3.0
    pv = fsum(typical * vol, 20)
    tv = fsum(vol, 20)
    vwap = np.where(tv > 0, pv / np.where(tv == 0, 1, tv), close)
    out["03_micro_vwap_deviation"] = sigmoid(safe_div(close - vwap, vwap) * 10000 / 20)

    c9 = np.concatenate([close[9:], np.full(9, np.nan)])
    out["03_micro_price_efficiency"] = safe_div(np.abs(close - c9), fsum(abs_rd, 9))

    response = safe_div(np.abs(rd) * 10000, np.log(1 + vol))
    out["03_micro_depth_imbalance"] = sigmoid((response - 5) / 5) * sgn(rd)

    ret = np.abs(rd / nxt)
    dollar = vol * close
    terms = np.where(dollar > 0, ret / np.where(dollar == 0, 1, dollar) * 1e6, 0.0)
    cnts = fsum((dollar > 0).astype("float64"), 10)
    amihud = np.where(cnts > 0, fsum(terms, 10) / np.where(cnts == 0, 1, cnts), 0.0)
    out["03_micro_amihud_illiquidity"] = sigmoid(amihud * 100)

    Wc = _wv(close, 10)
    Wv10 = _wv(vol, 10)
    near = np.abs(Wc - close[:, None]) < (close * 0.0001)[:, None]
    similar = near.sum(axis=1)
    vol_at = (Wv10 * near).sum(axis=1)
    out["03_micro_iceberg_pattern"] = np.where(
        (similar >= 3) & (vol_at > vol * 5), sgn(rd) * 0.5, 0.0)

    high1 = np.concatenate([high[1:], [np.nan]])
    low1 = np.concatenate([low[1:], [np.nan]])
    spike_up = (high > high1) & (close < high1)
    spike_dn = (low < low1) & (close > low1)
    out["03_micro_stop_hunt"] = np.where(spike_up, -0.5, np.where(spike_dn, 0.5, 0.0))

    # --- Position ---
    ema_stack_long = np.where((ema9 > ema21) & (ema21 > ema50), 1.0,
                              np.where(ema9 > ema21, 0.6, 0.2))
    ema_stack_short = np.where((ema9 < ema21) & (ema21 < ema50), 1.0,
                               np.where(ema9 < ema21, 0.6, 0.2))
    avg_vol_19prev = prev19                  # mean of C[1..19]
    vol_score = np.where(vol > avg_vol_19prev * 1.2, 1.0,
                         np.where(vol > avg_vol_19prev, 0.7, 0.4))

    Wlow51 = _wv(low, 51)
    Whigh51 = _wv(high, 51)
    lows_prev = Wlow51[:, 1:]                # C[1..50]
    highs_prev = Whigh51[:, 1:]
    below = np.where(lows_prev < close[:, None], lows_prev, -np.inf)
    support = below.max(axis=1)
    has_support = np.isfinite(support)
    support = np.where(has_support, support, close * 0.999)
    above = np.where(highs_prev > close[:, None], highs_prev, np.inf)
    resistance = above.min(axis=1)
    has_res = np.isfinite(resistance)
    resistance = np.where(has_res, resistance, close * 1.001)

    support_dist = (close - support) * 10000
    res_dist = (resistance - close) * 10000
    sup_score = np.where(support_dist < 5.0, 1.0, np.where(support_dist < 10.0, 0.7, 0.3))
    res_score = np.where(res_dist < 5.0, 1.0, np.where(res_dist < 10.0, 0.7, 0.3))

    avg_atr20 = fmean(atr14, 20)
    atr_score = np.where(atr14 < avg_atr20 * 1.5, 1.0, 0.5)

    lq = (ema_stack_long + 1.0 + vol_score + sup_score + atr_score) / 5.0
    sq = (ema_stack_short + 1.0 + vol_score + res_score + atr_score) / 5.0
    out["05_pos_long_quality"] = lq
    out["05_pos_short_quality"] = sq
    ud_denom = (up + down).astype("float64")
    with np.errstate(all="ignore"):
        up_share = up / ud_denom             # 0/0 -> NaN like C#
        down_share = down / ud_denom
    out["05_pos_long_entry_score"] = lq * (1.0 + up_share) / 2
    out["05_pos_short_entry_score"] = sq * (1.0 + down_share) / 2
    out["05_pos_long_risk_reward"] = safe_div(res_dist, support_dist)
    out["05_pos_short_risk_reward"] = safe_div(support_dist, res_dist)
    out["05_pos_long_success_prob"] = lq * 0.8
    out["05_pos_short_success_prob"] = sq * 0.8

    mp_long = (_wv(high, 10).max(axis=1) - low) * 10000
    mp_short = (high - _wv(low, 10).min(axis=1)) * 10000
    out["05_pos_long_trailing_active"] = (mp_long >= 3.5).astype("float64")
    out["05_pos_long_profit_potential"] = np.maximum(0.0, mp_long - 2.5)
    out["05_pos_long_max_favorable"] = mp_long
    out["05_pos_short_trailing_active"] = (mp_short >= 3.5).astype("float64")
    out["05_pos_short_profit_potential"] = np.maximum(0.0, mp_short - 2.5)
    out["05_pos_short_max_favorable"] = mp_short

    out["05_pos_downside_risk"] = support_dist
    out["05_pos_upside_potential"] = res_dist
    out["05_pos_risk_asymmetry"] = safe_div(res_dist, support_dist)
    out["05_pos_stop_distance"] = atr14 * 10000 * 2

    sup_touch = (np.abs(lows_prev - support[:, None]) < 0.0002).sum(axis=1)
    res_touch = (np.abs(highs_prev - resistance[:, None]) < 0.0002).sum(axis=1)
    out["05_pos_support_strength"] = np.minimum(1.0, sup_touch / 5.0)
    out["05_pos_resistance_strength"] = np.minimum(1.0, res_touch / 5.0)

    long_entry = np.minimum(close - atr14 * 0.5, ema9)
    short_entry = np.maximum(close + atr14 * 0.5, ema9)
    out["05_pos_optimal_long_entry"] = long_entry
    out["05_pos_optimal_short_entry"] = short_entry
    out["05_pos_distance_to_long_entry"] = safe_div(long_entry - close, close) * 10000
    out["05_pos_distance_to_short_entry"] = safe_div(close - short_entry, close) * 10000

    Wmv = np.abs(_wv(rd, 9))                 # |rd[a..a+8]| = |C[d-1]-C[d]| d=1..9
    mv_pos = Wmv > 0
    mv_sum = (Wmv * mv_pos).sum(axis=1)
    mv_cnt = mv_pos.sum(axis=1)
    avg_move = np.where(mv_cnt > 0, mv_sum / np.where(mv_cnt == 0, 1, mv_cnt), atr14)
    dur = safe_div(3.5 * 0.0001, avg_move)
    out["05_pos_expected_long_duration"] = dur
    out["05_pos_expected_short_duration"] = dur

    la = np.where(ema9 > ema21, 0.5, 0.0) + np.where(ema21 > ema50, 0.5, 0.0)
    sa = np.where(ema9 < ema21, 0.5, 0.0) + np.where(ema21 < ema50, 0.5, 0.0)
    out["05_pos_mtf_long_alignment"] = la
    out["05_pos_mtf_short_alignment"] = sa
    out["05_pos_mtf_consensus"] = np.abs(la - sa)

    out["05_pos_recommended_size_long"] = lq * (lq * 0.8)
    out["05_pos_recommended_size_short"] = sq * (sq * 0.8)
    out["05_pos_size_confidence"] = np.maximum(lq * 0.8, sq * 0.8)

    wp_l = 0.4 + lq * 0.3
    wp_s = 0.4 + sq * 0.3
    out["05_pos_long_expectancy"] = wp_l * (3.5 - 2.5) - (1 - wp_l) * 10.0
    out["05_pos_short_expectancy"] = wp_s * (3.5 - 2.5) - (1 - wp_s) * 10.0

    return out


def _candle_direction(open_, high, low, close):
    body = close - open_
    rng = high - low
    ok = rng >= 1e-10
    rngs = np.where(ok, rng, 1.0)
    br = body / rngs
    upper = (high - np.maximum(open_, close)) / rngs
    lower = (np.minimum(open_, close) - low) / rngs
    v = np.where(
        (br > 0.6) & (upper < 0.2), 1.0,
        np.where((br < -0.6) & (lower < 0.2), -1.0,
                 np.where((np.abs(br) < 0.3) & (lower > 0.6), 0.5,
                          np.where((np.abs(br) < 0.3) & (upper > 0.6), -0.5, br))))
    return np.where(ok, v, 0.0)


def _ma_alignment(price, ema9, ema21, ema50):
    bull = ((price > ema9).astype("float64") + (ema9 > ema21) + (ema21 > ema50))
    return np.where((price > ema9) & (ema9 > ema21) & (ema21 > ema50), 1.0,
                    np.where((price < ema9) & (ema9 < ema21) & (ema21 < ema50), -1.0,
                             (bull - 1.5) / 1.5))


# ---------------------------------------------------------------- M5 kernels

def anchored_m5(open_, high, low, close, vol, up, down, avg_spread, ts_us):
    """All M5 anchored feature arrays (regime / DL / ML), indexed by anchor."""
    n = len(close)
    out = {}

    nxt = np.concatenate([close[1:], [np.nan]])
    rd = close - nxt
    abs_rd = np.abs(rd)
    lr = np.log(close / nxt)               # log(C[d]/C[d+1])
    lr2 = lr * lr
    hd = high - np.concatenate([high[1:], [np.nan]])
    ld = np.concatenate([low[1:], [np.nan]]) - low
    tr = np.maximum(high - low,
                    np.maximum(np.abs(high - nxt), np.abs(low - nxt)))
    atr14 = fmean(tr, 14)

    def rv(p):
        return np.sqrt(fmean(lr2, p) * 252 * 1440)

    rv10, rv14, rv20, rv50 = rv(10), rv(14), rv(20), rv(50)
    out["_rv20"] = rv20                    # regime volatility history input

    def trend_dir(p):
        start = np.concatenate([close[p - 1:], np.full(p - 1, np.nan)])
        return sigmoid((close - start) / start * 10000)

    def ke(p):
        endd = np.concatenate([close[p - 1:], np.full(p - 1, np.nan)])
        return safe_div(np.abs(close - endd), fsum(abs_rd, p - 1))

    ke10 = ke(10)
    ke20 = ke(20)

    dmp = np.where((hd > ld) & (hd > 0), hd, 0.0)
    dmm = np.where((ld > hd) & (ld > 0), ld, 0.0)
    st14 = fsum(tr, 14)
    di_p = safe_div(fsum(dmp, 14), st14) * 100
    di_m = safe_div(fsum(dmm, 14), st14) * 100
    adx14 = safe_div(np.abs(di_p - di_m), di_p + di_m) * 100

    volatile = rv14 > rv50 * 1.5
    trending = (~volatile) & (adx14 > 25) & (ke20 > 0.3)
    regime_type = np.where(volatile, 2.0, np.where(trending, 1.0, 0.0))
    with np.errstate(all="ignore"):
        conf_vol = np.minimum(1.0, rv14 / (rv50 * 2))
    conf_trend = np.minimum(1.0, (adx14 - 20) / 30.0) * ke20
    conf_range = 1.0 - ke20
    regime_conf = np.where(volatile, conf_vol, np.where(trending, conf_trend, conf_range))
    out["02_regime_type"] = regime_type
    out["02_regime_confidence"] = regime_conf
    out["_regime_type_int"] = regime_type     # emission-state input

    sma20 = fmean(close, 20)
    sma10 = fmean(close, 10)
    t20 = trend_dir(20)
    dev_mr = (close - sma20) / sma20
    mean_rev = np.where(np.abs(dev_mr) > 0.01,
                        -sgn(dev_mr) * np.minimum(1.0, np.abs(dev_mr) * 100), 0.0)
    out["02_regime_directional_bias"] = np.where(
        regime_type == 1, t20, np.where(regime_type == 0, mean_rev, 0.0))

    t5 = trend_dir(5)
    t50 = trend_dir(50)
    s5, s20, s50 = sgn(t5), sgn(t20), sgn(t50)
    alignment = np.where((s5 == s20) & (s20 == s50), s5,
                         np.where(s5 == s20, s5 * 0.5, 0.0))
    out["02_trend_mtf_alignment"] = alignment
    out["02_trend_mtf_strength"] = (np.abs(t5) + np.abs(t20) + np.abs(t50)) / 3

    out["02_trend_efficiency"] = ke10
    up_bars = fsum((close > open_).astype("float64"), 20)
    consistency = np.abs(up_bars - (20 - up_bars)) / 20.0
    trend_quality = (consistency + ke10) / 2
    out["02_trend_quality"] = trend_quality

    with np.errstate(all="ignore"):
        vol_stress = np.maximum(0.0, (rv10 - rv50) / rv50)
        sp_mean = fmean(avg_spread, 20)
        spread_stress = np.maximum(0.0, (avg_spread - sp_mean) / sp_mean)
        ivol = np.asarray(vol, dtype="int64")
        vol_sum19 = fsum(ivol.astype("float64"), 19)
        prev_vsum = np.concatenate([vol_sum19[1:], [np.nan]])   # C[1..19]
        iavg = np.floor(prev_vsum / 19)     # C# int division on the int sum
        volume_stress = np.maximum(0.0, (vol - iavg) / iavg - 1)
    stress = sigmoid((vol_stress * 0.4 + spread_stress * 0.3 + volume_stress * 0.3) * 2)
    out["02_market_stress"] = stress

    R = _wv(lr, 50)[:, ::-1]               # returns in the C# iteration order
    rmean = R.mean(axis=1)
    cum = np.cumsum(R - rmean[:, None], axis=1)
    rrange = cum.max(axis=1) - cum.min(axis=1)
    rstd = np.sqrt(((R - rmean[:, None]) ** 2).mean(axis=1))
    with np.errstate(all="ignore"):
        hurst = np.log(rrange / rstd) / np.log(50.0)
    hurst = np.where(rstd < 1e-10, 0.5, np.clip(hurst, 0.0, 1.0))
    out["02_hurst_exponent"] = (hurst - 0.5) * 2

    c20 = np.concatenate([close[20:], np.full(20, np.nan)])
    c5_ = np.concatenate([close[5:], np.full(5, np.nan)])
    mom = np.where(regime_type == 1, close - c20,
                   np.where(regime_type == 0, -(close - sma10), close - c5_))
    out["02_regime_momentum"] = sigmoid(mom * 10000)

    out["_regime_conf"] = regime_conf
    out["_trend_quality"] = trend_quality
    out["_ke10"] = ke10
    out["_stress"] = stress
    out["02_market_condition_score"] = (regime_conf * 0.2 + trend_quality * 0.3
                                        + ke10 * 0.3 + (1 - stress) * 0.2)

    # --- DeepLearning ---
    W10 = _wv(close, 10)
    out["06_dl_price_embedding"] = _embedding(W10)
    W20 = _wv(close, 20)

    att = np.exp(-((close[:, None] - W20) ** 2) / 0.02)
    mx = att.max(axis=1)
    ew = np.exp(att - mx[:, None])
    wsum = ew.sum(axis=1)
    wts = ew / wsum[:, None]
    wpos = np.where(wts > 1e-10, wts, 1.0)
    out["06_dl_attention_spread"] = -(np.where(wts > 1e-10, wts * np.log(wpos), 0.0)).sum(axis=1)
    out["06_dl_context_strength"] = (wts * W20).sum(axis=1)

    for k in (3, 5, 7, 9):
        w = np.exp(-np.arange(k) * 0.1)
        Wk = _wv(close, k)
        out[f"06_dl_conv_{k}_price"] = (Wk * w).sum(axis=1) / w.sum()

    Wh20 = _wv(high, 20)
    out["06_dl_maxpool_price"] = Wh20[:, [19, 14, 9, 4]].max(axis=1)
    out["06_dl_avgpool_price"] = W20[:, [19, 14, 9, 4]].mean(axis=1)

    avg_atr20 = fmean(atr14, 20)
    with np.errstate(all="ignore"):
        out["06_dl_forget_gate"] = np.minimum(1.0, atr14 / avg_atr20)
    out["06_dl_input_gate"] = np.minimum(1.0, np.abs(rd) / (atr14 + 1e-10))

    def autocorr(lag):
        Wl = _wv(close, 2 * lag + 1)
        m = Wl.mean(axis=1)
        d = Wl - m[:, None]
        num = (d[:, : lag + 1] * d[:, lag:]).sum(axis=1)
        den = (d ** 2).sum(axis=1)
        return np.where(den > 0, num / np.where(den == 0, 1, den), 0.0)

    pat = np.maximum.reduce([np.abs(autocorr(l)) for l in (5, 10, 15, 20)])
    out["06_dl_pattern_score"] = np.maximum(0.0, pat)
    cyc = np.maximum.reduce([autocorr(p) for p in range(3, 11)])
    out["06_dl_cycle_strength"] = np.maximum(0.0, cyc)

    Wv20 = _wv(vol, 20)
    pm = W20.mean(axis=1)
    vm = Wv20.mean(axis=1)
    out["06_dl_bottleneck_feat"] = ((W20 - pm[:, None]) * (Wv20 - vm[:, None])).mean(axis=1)

    for scale in (5, 10, 20, 50):
        out[f"06_dl_multiscale_{scale}"] = fmean(close, scale)

    out["06_dl_encoded_seq"] = _embedding(W20)
    out["06_dl_decoded_state"] = close.copy()

    avg_vol10 = fmean(vol, 10)
    out["06_dl_node_importance"] = safe_div(vol, avg_vol10)

    pstd = np.sqrt(((W20 - pm[:, None]) ** 2).mean(axis=1))
    out["06_dl_layer_norm"] = safe_div(close - pm, pstd + 1e-10)

    e5 = fmean(close, 5)
    e10 = fmean(close, 10)
    e20 = fmean(close, 20)
    eavg = (e5 + e10 + e20) / 3
    evar = ((e5 - eavg) ** 2 + (e10 - eavg) ** 2 + (e20 - eavg) ** 2) / 3
    out["06_dl_feature_robustness"] = 1.0 / (1.0 + evar)

    W30 = _wv(close, 30)
    out["06_dl_sequence_complexity"] = _complexity(W30)
    out["06_dl_sequence_entropy"] = _entropy10(W30, ml_clip_low=False)

    # --- MachineLearning (anchored part) ---
    W50 = _wv(close, 50)
    p_mean = W50.mean(axis=1)
    p_std = np.sqrt(((W50 - p_mean[:, None]) ** 2).mean(axis=1))
    Wv50 = _wv(vol, 50)
    v_mean = Wv50.mean(axis=1)
    v_std = np.sqrt(((Wv50 - v_mean[:, None]) ** 2).mean(axis=1))
    out["07_ml_price_zscore"] = safe_div(close - p_mean, p_std)
    out["07_ml_volume_zscore"] = safe_div(vol - v_mean, v_std)

    c10 = np.concatenate([close[10:], np.full(10, np.nan)])
    with np.errstate(all="ignore"):
        rets = np.log(close / c10)
    out["07_ml_returns_squared"] = rets * rets
    out["07_ml_returns_cubed"] = rets * rets * rets

    Vs = np.sort(_wv(vol, 20), axis=1)
    total = Vs.sum(axis=1)
    coeff = 2 * np.arange(1, 21) - 20 - 1
    gini = (Vs * coeff).sum(axis=1)
    out["07_ml_volume_gini"] = np.where(total < 1e-10, 0.0,
                                        gini / (20 * np.where(total == 0, 1, total)))

    dp = W20 - W20.mean(axis=1)[:, None]
    dv = Wv20 - Wv20.mean(axis=1)[:, None]
    # correlation uses the C# raw-moment formula verbatim (cancellation and
    # all); covariance uses the two-pass form like the C# helper
    num = 20 * (W20 * Wv20).sum(axis=1) - W20.sum(axis=1) * Wv20.sum(axis=1)
    den = np.sqrt((20 * (W20 ** 2).sum(axis=1) - W20.sum(axis=1) ** 2)
                  * (20 * (Wv20 ** 2).sum(axis=1) - Wv20.sum(axis=1) ** 2))
    out["07_ml_price_volume_correlation"] = np.where(den > 1e-10, num / np.where(den == 0, 1, den), 0.0)
    out["07_ml_price_volume_covariance"] = (dp * dv).mean(axis=1)

    y = W20[:, ::-1]                        # slope over the reversed sequence
    xs = np.arange(20.0)
    sum_x = xs.sum()
    sum_x2 = (xs ** 2).sum()
    sum_y = y.sum(axis=1)
    sum_xy = (y * xs).sum(axis=1)
    slope = safe_div(20 * sum_xy - sum_x * sum_y, 20 * sum_x2 - sum_x * sum_x)
    ema9_ = fmean(close, 9)
    ema21_ = fmean(close, 21)
    ema50_ = fmean(close, 50)
    stack = np.where((ema9_ > ema21_) & (ema21_ > ema50_), 1.0,
                     np.where((ema9_ < ema21_) & (ema21_ < ema50_), -1.0, 0.0))
    out["07_ml_composite_trend_score"] = (0.0 + np.tanh(slope * 1000) + stack) / 3

    macd = fmean(close, 12) - fmean(close, 26)
    roc = safe_div(close - c10, c10)
    out["07_ml_composite_momentum_score"] = (0.0 + np.tanh(macd * 1000)
                                             + np.tanh(roc * 100)) / 3

    std20 = np.sqrt(fvar_pop(close, 20))
    out["07_ml_composite_volatility_score"] = (
        np.minimum(1.0, safe_div(atr14, close) * 1000)
        + np.minimum(1.0, safe_div(std20, close) * 1000)) / 2

    out["_ml_spread_quality"] = 1.0 - np.minimum(1.0, avg_spread * 10000)
    out["_ml_volume_rolling_mean"] = v_mean

    W30p = _wv(close, 30)
    out["07_ml_price_entropy"] = _entropy10(W30p, ml_clip_low=True)
    W30v = _wv(vol, 30)
    out["07_ml_volume_entropy"] = _entropy10(W30v, ml_clip_low=True)

    out["07_ml_price_bin"] = _bin(close, p_mean, p_std)
    out["07_ml_volume_bin"] = _bin(vol, v_mean, v_std)

    hour = (np.asarray(ts_us, dtype="int64") // 3_600_000_000) % 24
    out["07_ml_hour_asian"] = ((hour >= 0) & (hour < 8)).astype("float64")
    out["07_ml_hour_european"] = ((hour >= 8) & (hour < 16)).astype("float64")
    out["07_ml_hour_american"] = ((hour >= 16) & (hour < 24)).astype("float64")

    for l in (1, 3, 5):
        out[f"07_ml_price_lag_{l}"] = np.concatenate([close[l:], np.full(l, np.nan)])
    out["07_ml_pct_change_lag_5"] = safe_div(close - c5_, c5_) * 100

    out["_close"] = close.copy()            # ML price history input (anchor close)
    out["_vol"] = vol.astype("float64")     # ML volume history input

    return out


def _embedding(W):
    m = W.mean(axis=1)
    d = W - m[:, None]
    std = np.sqrt((d ** 2).mean(axis=1))
    n = W.shape[1]
    with np.errstate(all="ignore"):
        skew = ((d / std[:, None]) ** 3).sum(axis=1) * n / ((n - 1) * (n - 2))
    skew = np.where(std < 1e-10, 0.0, skew)
    return m * 0.5 + std * 0.3 + skew * 0.2


def _entropy10(W, ml_clip_low: bool):
    n, width = W.shape
    valid = np.isfinite(W).all(axis=1)
    Wc = np.where(valid[:, None], W, 0.0)
    mn = Wc.min(axis=1)
    mx = Wc.max(axis=1)
    bw = (mx - mn) / 10
    ok = bw >= 1e-10
    bws = np.where(ok, bw, 1.0)
    idx = ((Wc - mn[:, None]) / bws[:, None]).astype("int64")
    idx = np.clip(idx, 0, 9)   # >=10 -> 9; DL has no <0 clip but idx >= 0 anyway
    counts = np.zeros((n, 10))
    rows = np.broadcast_to(np.arange(n)[:, None], W.shape)
    np.add.at(counts, (rows.ravel(), idx.ravel()), 1.0)
    p = counts / width
    with np.errstate(all="ignore"):
        ent = -np.where(counts > 0, p * np.log2(np.where(counts > 0, p, 1.0)), 0.0).sum(axis=1)
    return np.where(valid, np.where(ok, ent, 0.0), np.nan)


def _complexity(W30):
    n = W30.shape[0]
    valid = np.isfinite(W30).all(axis=1)
    mean = W30.mean(axis=1)
    binary = (W30 > mean[:, None]).astype("int64")
    total = np.zeros(n)
    for length in range(1, 6):
        k = 30 - length + 1
        codes = np.zeros((n, k), dtype="int64")
        for j in range(length):
            codes = codes * 2 + binary[:, j:j + k]
        codes = np.sort(codes, axis=1)
        distinct = 1 + (np.diff(codes, axis=1) != 0).sum(axis=1)
        total += distinct
    return np.where(valid, total / 30.0, np.nan)


def _bin(value, mean, std):
    z = np.where(std < 1e-10, 0.0, (value - mean) / np.where(std < 1e-10, 1.0, std))
    out = np.where(z < -2, -3.0,
                   np.where(z < -1, -2.0,
                            np.where(z < -0.5, -1.0,
                                     np.where(z < 0.5, 0.0,
                                              np.where(z < 1, 1.0,
                                                       np.where(z < 2, 2.0, 3.0))))))
    return np.where(std < 1e-10, 0.0, out)
