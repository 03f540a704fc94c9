"""Label oracle — transcription of /root/reference/Label/LabelGenerator.cs.

GenerateLabel(config, currentTick, futureTicks):
  * futureTicks = up to 600 ticks strictly after the entry tick
    (Program.cs:260-263: entry tick = the tick that completed the bar)
  * < 10 future ticks -> neutral (LabelGenerator.cs:46-47)
  * stop loss inferred from spread when config SL <= 0 (LabelGenerator.cs:59-68)
  * trailing-stop simulation with exit priority SL -> TP -> trail -> time
    (LabelGenerator.cs:128-217)
"""

from __future__ import annotations

from dataclasses import dataclass

PIP = 0.0001
TP_MULT = 3.0
MAX_TIME_LIMIT_TICKS = 600.0
DEFAULT_MIN_SL_PIPS = 5.0
DEFAULT_SPREAD_MULT = 3.0


@dataclass
class LabelConfig:
    stop_loss_pips: float = 0.0
    trigger_pips: float = 3.5
    distance_pips: float = 2.5
    max_future_ticks: int = 600
    min_confidence: float = 0.3
    min_score: float = 0.35


@dataclass
class TrailingStopResult:
    profit_pips: float
    mfe_pips: float
    mae_pips: float
    time_to_exit: int
    trailing_activated: bool


def simulate_trailing_stop(entry_bid: float, entry_ask: float,
                           fut_bid, fut_ask,
                           activation_pips: float, distance_pips: float,
                           stop_loss_pips: float, is_long: bool) -> TrailingStopResult:
    entry_price = entry_ask if is_long else entry_bid
    activation_distance = activation_pips * PIP
    trail_distance = distance_pips * PIP
    stop_loss_distance = max(0.0, stop_loss_pips) * PIP
    take_profit_distance = activation_distance * TP_MULT

    sl_enabled = stop_loss_distance > 0.0
    sl_price = (entry_price - stop_loss_distance if is_long
                else entry_price + stop_loss_distance) if sl_enabled else 0.0

    trailing_activated = False
    trailing_stop = 0.0
    mfe = 0.0
    mae = 0.0
    exit_price = 0.0
    exit_tick = -1

    n = len(fut_bid)
    for i in range(n):
        price = float(fut_bid[i] if is_long else fut_ask[i])
        move = (price - entry_price) if is_long else (entry_price - price)

        if move >= 0:
            mfe = max(mfe, move)
        else:
            mae = max(mae, abs(move))

        if sl_enabled:
            hit = (price <= sl_price) if is_long else (price >= sl_price)
            if hit:
                exit_price = sl_price
                exit_tick = i
                break

        if move >= take_profit_distance:
            exit_price = price
            exit_tick = i
            break

        if not trailing_activated:
            if move >= activation_distance:
                trailing_activated = True
                trailing_stop = price - trail_distance if is_long else price + trail_distance
        else:
            if is_long:
                trailing_stop = max(trailing_stop, price - trail_distance)
                if price <= trailing_stop:
                    exit_price = trailing_stop
                    exit_tick = i
                    break
            else:
                trailing_stop = min(trailing_stop, price + trail_distance)
                if price >= trailing_stop:
                    exit_price = trailing_stop
                    exit_tick = i
                    break

        if i >= MAX_TIME_LIMIT_TICKS:   # unreachable for windows <= 600, kept faithful
            exit_price = price
            exit_tick = i
            break

    if exit_tick < 0:
        exit_price = float(fut_bid[n - 1] if is_long else fut_ask[n - 1])
        exit_tick = n - 1

    profit = ((exit_price - entry_price) if is_long else (entry_price - exit_price)) / PIP
    return TrailingStopResult(profit, mfe / PIP, mae / PIP, exit_tick, trailing_activated)


def quality_score(r: TrailingStopResult) -> float:
    if not r.trailing_activated:
        return 0.0
    profit_score = min(1.0, max(0.0, r.profit_pips / 10.0))
    risk_score = min(1.0, max(0.0, 1 - r.mae_pips / 10.0)) if r.mae_pips > 0 else 1.0
    time_score = min(1.0, max(0.0, 1 - r.time_to_exit / MAX_TIME_LIMIT_TICKS))
    return profit_score * 0.5 + risk_score * 0.3 + time_score * 0.2


def generate_label_result(cfg: LabelConfig, entry_bid: float, entry_ask: float,
                          fut_bid, fut_ask) -> dict:
    """Full LabelResult surface (LabelGenerator.cs:17-27 + DetermineLabel
    cs:242-272): label plus confidence, per-side profit pips, MAE/MFE maxima,
    time-to-target of the chosen side, risk-reward (long side only when
    label == 1, otherwise the SHORT result — cs:271 faithful quirk), and the
    max quality score. Fewer than 10 future ticks -> CreateNeutralResult
    (all fields zero, cs:296-303)."""
    zero = {"label": 0, "confidence": 0.0, "long_profit_pips": 0.0,
            "short_profit_pips": 0.0, "mae_pips": 0.0, "mfe_pips": 0.0,
            "time_to_target": 0, "risk_reward": 0.0, "quality_score": 0.0}
    if fut_bid is None or len(fut_bid) < 10:
        return zero

    k = min(len(fut_bid), cfg.max_future_ticks)
    fb, fa = fut_bid[:k], fut_ask[:k]
    spread_pips = (entry_ask - entry_bid) / PIP
    sl_pips = (cfg.stop_loss_pips if cfg.stop_loss_pips > 0.0
               else max(DEFAULT_MIN_SL_PIPS,
                        max(cfg.distance_pips, spread_pips * DEFAULT_SPREAD_MULT)))
    lr = simulate_trailing_stop(entry_bid, entry_ask, fb, fa,
                                cfg.trigger_pips, cfg.distance_pips, sl_pips, True)
    sr = simulate_trailing_stop(entry_bid, entry_ask, fb, fa,
                                cfg.trigger_pips, cfg.distance_pips, sl_pips, False)
    lq, sq = quality_score(lr), quality_score(sr)
    confidence = abs(lq - sq)
    label = 0
    if confidence >= cfg.min_confidence:
        if lq > sq and lq >= cfg.min_score:
            label = 1
        elif sq > lq and sq >= cfg.min_score:
            label = -1
    rr_side = lr if label == 1 else sr
    if rr_side.mae_pips <= 0:
        rr = 10.0 if rr_side.profit_pips > 0 else 0.0
    else:
        rr = rr_side.profit_pips / rr_side.mae_pips
    return {
        "label": label,
        "confidence": min(1.0, confidence),
        "long_profit_pips": lr.profit_pips,
        "short_profit_pips": sr.profit_pips,
        "mae_pips": max(lr.mae_pips, sr.mae_pips),
        "mfe_pips": max(lr.mfe_pips, sr.mfe_pips),
        "time_to_target": (lr.time_to_exit if label == 1
                           else sr.time_to_exit if label == -1 else 0),
        "risk_reward": rr,
        "quality_score": max(lq, sq),
    }


def generate_label(cfg: LabelConfig, entry_bid: float, entry_ask: float,
                   fut_bid, fut_ask) -> int:
    """Returns the persisted label only (Program.cs:323 persists just Label)."""
    if fut_bid is None or len(fut_bid) < 10:
        return 0

    k = min(len(fut_bid), cfg.max_future_ticks)
    fb, fa = fut_bid[:k], fut_ask[:k]

    spread_pips = (entry_ask - entry_bid) / PIP
    sl_pips = (cfg.stop_loss_pips if cfg.stop_loss_pips > 0.0
               else max(DEFAULT_MIN_SL_PIPS,
                        max(cfg.distance_pips, spread_pips * DEFAULT_SPREAD_MULT)))

    lr = simulate_trailing_stop(entry_bid, entry_ask, fb, fa,
                                cfg.trigger_pips, cfg.distance_pips, sl_pips, True)
    sr = simulate_trailing_stop(entry_bid, entry_ask, fb, fa,
                                cfg.trigger_pips, cfg.distance_pips, sl_pips, False)

    lq = quality_score(lr)
    sq = quality_score(sr)
    confidence = abs(lq - sq)

    label = 0
    if confidence >= cfg.min_confidence:
        if lq > sq and lq >= cfg.min_score:
            label = 1
        elif sq > lq and sq >= cfg.min_score:
            label = -1
    return label
