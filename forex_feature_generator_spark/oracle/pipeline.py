"""Oracle end-to-end pipeline — transcription of Program.cs:181-368 +
FeaturePipeline.cs:96-171 for ONE source; multi-source = independent runs.

Emission semantics reproduced:
  * CalculateFeatures runs for EVERY completed M1 bar (per-emission ring
    buffers accumulate from the start, Program.cs:249-263)
  * warm-up: rows persisted only when barsProcessed > 260 (Program.cs:194,267)
  * exactly-148-features assert (Program.cs:269-272)
  * calculator pipeline gate: skip when its timeframe has < 50 bars
    (FeaturePipeline.cs:130); M5 state advances on the M1 emission clock
  * validation: NaN/Inf -> 0 then clip |v|>10 -> sign*10 (FeaturePipeline.cs:150-170)
  * label entry tick = the tick that completed the bar; future window =
    the next 600 ticks (Program.cs:260-263)
  * timestamp persisted as .NET DateTime.Ticks (Program.cs:324)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .bars import aggregate_bars
from .calculators import make_calculators
from .labels import LabelConfig, generate_label

DOTNET_EPOCH_TICKS = 621355968000000000
WARMUP_BARS = 260


def dotnet_ticks(ts_us: int) -> int:
    return DOTNET_EPOCH_TICKS + int(ts_us) * 10


# The pinned 148-feature order (FIXTURES.md; dict insertion order of the
# calculators in priority order).
def feature_names_148() -> list[str]:
    names = []
    names += ["01_dir_momentum_z5", "01_dir_momentum_z10", "01_dir_momentum_accel",
              "01_dir_momentum_quality", "01_dir_candle_direction",
              "01_dir_pattern_strength", "01_dir_price_position",
              "01_dir_volume_direction", "01_dir_volume_pressure",
              "01_dir_vol_mom_correlation", "01_dir_trend_strength",
              "01_dir_dm_plus", "01_dir_dm_minus", "01_dir_trend_efficiency",
              "01_dir_mean_reversion_prob"]
    names += ["02_regime_type", "02_regime_confidence", "02_regime_directional_bias",
              "02_regime_duration_norm", "02_regime_stability", "02_vol_trend",
              "02_trend_mtf_alignment", "02_trend_mtf_strength", "02_trend_efficiency",
              "02_trend_quality", "02_cyclical_phase", "02_market_stress",
              "02_hurst_exponent", "02_regime_momentum", "02_market_condition_score"]
    names += ["03_micro_flow_imbalance", "03_micro_flow_acceleration",
              "03_micro_buy_pressure", "03_micro_sell_pressure", "03_micro_pressure_diff",
              "03_micro_volume_spike", "03_micro_spike_direction", "03_micro_spread_zscore",
              "03_micro_spread_volume_ratio", "03_micro_tick_intensity",
              "03_micro_tick_direction", "03_micro_tick_clustering",
              "03_micro_vwap_deviation", "03_micro_price_efficiency",
              "03_micro_depth_imbalance", "03_micro_amihud_illiquidity",
              "03_micro_iceberg_pattern", "03_micro_stop_hunt"]
    names += ["04_tech_rsi_normalized", "04_tech_rsi_momentum", "04_tech_rsi_composite",
              "04_tech_macd_normalized", "04_tech_macd_quality", "04_tech_bb_position",
              "04_tech_bb_squeeze", "04_tech_bb_expansion", "04_tech_ma_alignment",
              "04_tech_ma_dev_9", "04_tech_ma_dev_21", "04_tech_ma_convergence",
              "04_tech_atr_ratio", "04_tech_vol_percentile"]
    names += ["05_pos_long_quality", "05_pos_long_entry_score", "05_pos_long_risk_reward",
              "05_pos_long_success_prob", "05_pos_short_quality", "05_pos_short_entry_score",
              "05_pos_short_risk_reward", "05_pos_short_success_prob",
              "05_pos_long_trailing_active", "05_pos_long_profit_potential",
              "05_pos_long_max_favorable", "05_pos_short_trailing_active",
              "05_pos_short_profit_potential", "05_pos_short_max_favorable",
              "05_pos_downside_risk", "05_pos_upside_potential", "05_pos_risk_asymmetry",
              "05_pos_stop_distance", "05_pos_support_strength", "05_pos_resistance_strength",
              "05_pos_optimal_long_entry", "05_pos_optimal_short_entry",
              "05_pos_distance_to_long_entry", "05_pos_distance_to_short_entry",
              "05_pos_expected_long_duration", "05_pos_expected_short_duration",
              "05_pos_mtf_long_alignment", "05_pos_mtf_short_alignment", "05_pos_mtf_consensus",
              "05_pos_recommended_size_long", "05_pos_recommended_size_short",
              "05_pos_size_confidence", "05_pos_long_expectancy", "05_pos_short_expectancy"]
    names += ["06_dl_price_embedding", "06_dl_attention_spread", "06_dl_context_strength",
              "06_dl_conv_3_price", "06_dl_conv_5_price", "06_dl_conv_7_price",
              "06_dl_conv_9_price", "06_dl_maxpool_price", "06_dl_avgpool_price",
              "06_dl_forget_gate", "06_dl_input_gate", "06_dl_pattern_score",
              "06_dl_cycle_strength", "06_dl_bottleneck_feat", "06_dl_multiscale_5",
              "06_dl_multiscale_10", "06_dl_multiscale_20", "06_dl_multiscale_50",
              "06_dl_encoded_seq", "06_dl_decoded_state", "06_dl_node_importance",
              "06_dl_pos_encoding_sin", "06_dl_pos_encoding_cos", "06_dl_layer_norm",
              "06_dl_feature_robustness", "06_dl_sequence_complexity", "06_dl_sequence_entropy"]
    names += ["07_ml_price_zscore", "07_ml_volume_zscore", "07_ml_returns_squared",
              "07_ml_returns_cubed", "07_ml_volume_gini", "07_ml_volume_short_long_ratio",
              "07_ml_price_volume_correlation", "07_ml_price_volume_covariance",
              "07_ml_composite_trend_score", "07_ml_composite_momentum_score",
              "07_ml_composite_volatility_score", "07_ml_market_quality_score",
              "07_ml_price_percentile_50", "07_ml_volume_percentile_50",
              "07_ml_price_entropy", "07_ml_volume_entropy", "07_ml_price_bin",
              "07_ml_volume_bin", "07_ml_hour_asian", "07_ml_hour_european",
              "07_ml_hour_american", "07_ml_price_lag_1", "07_ml_price_lag_3",
              "07_ml_price_lag_5", "07_ml_pct_change_lag_5"]
    assert len(names) == 148
    return names


FEATURE_NAMES = feature_names_148()


def validate_features(features: dict) -> None:
    """FeaturePipeline.ValidateFeatures: NaN/Inf->0, then clip on the ORIGINAL
    value (a NaN never trips the clip: Math.Abs(NaN) > 10 is false)."""
    for key in list(features.keys()):
        value = features[key]
        if np.isnan(value) or np.isinf(value):
            features[key] = 0.0
        if abs(value) > 10:
            features[key] = float(np.sign(value) * 10)


def run_source(ts_us: np.ndarray, bid: np.ndarray, ask: np.ndarray,
               label_cfg: LabelConfig | None = None,
               warmup_bars: int = WARMUP_BARS) -> pd.DataFrame:
    """Run the full oracle for one source. Returns the emitted rows:
    (ts_us, timestamp, label, <148 features in pinned order>)."""
    cfg = label_cfg or LabelConfig()
    m1 = aggregate_bars(ts_us, bid, ask, 1)
    m5 = aggregate_bars(ts_us, bid, ask, 5)
    calculators = make_calculators()

    m5_completions = [b.completion_idx for b in m5]
    rows = []
    m5_count = 0
    for k, bar in enumerate(m1):
        c = bar.completion_idx
        while m5_count < len(m5) and m5_completions[m5_count] <= c:
            m5_count += 1
        bars_processed = k + 1

        # windows, reversed (most-recent-first), <= 500 bars
        m1_cnt = min(500, k + 1)
        m1_window = list(reversed(m1[k + 1 - m1_cnt:k + 1]))
        m5_cnt = min(500, m5_count)
        m5_window = list(reversed(m5[m5_count - m5_cnt:m5_count])) if m5_cnt else []

        features: dict = {}
        for calc in calculators:
            window = m1_window if calc.timeframe == 1 else m5_window
            if len(window) < 50:
                continue
            calc.calculate(features, window, len(window) - 1)
        validate_features(features)

        if bars_processed > warmup_bars:
            if len(features) != 148:
                raise AssertionError(
                    f"Not enough features at bar {bars_processed} ({len(features)})")
            fut = slice(c + 1, c + 1 + cfg.max_future_ticks)
            label = generate_label(cfg, float(bid[c]), float(ask[c]),
                                   bid[fut], ask[fut])
            row = {"ts_us": bar.ts_us,
                   "timestamp": dotnet_ticks(bar.ts_us),
                   "label": label}
            row.update(features)
            rows.append(row)

    if not rows:
        return pd.DataFrame(columns=["ts_us", "timestamp", "label"] + FEATURE_NAMES)
    df = pd.DataFrame(rows)
    return df[["ts_us", "timestamp", "label"] + FEATURE_NAMES]


def run_multi_source(ticks: pd.DataFrame, label_cfg: LabelConfig | None = None,
                     warmup_bars: int = WARMUP_BARS) -> pd.DataFrame:
    """ticks: (source, seq, ts, bid, ask). Returns rows with `source` key."""
    outs = []
    for source, g in ticks.groupby("source", sort=True):
        g = g.sort_values("seq")
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        out = run_source(ts_us, g["bid"].to_numpy(), g["ask"].to_numpy(),
                         label_cfg, warmup_bars)
        out.insert(0, "source", source)
        outs.append(out)
    return pd.concat(outs, ignore_index=True)
