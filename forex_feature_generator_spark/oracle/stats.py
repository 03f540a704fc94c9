"""Statistics + normalization oracle.

FeatureStatisticsCollector (Statistics/FeatureStatisticsCollector.cs): Welford
count/mean/M2 (sample variance), min/max, quantiles. The reference samples a
nondeterministic 10k reservoir for quantiles (cs:53-65) — the oracle (and the
engine) use EXACT quantiles with the same linear-interpolation formula
(cs:80-91); documented deviation, SURVEY §2.3.

DataNormalizer (Pipeline/DataNormalizer.cs:156-194) + NormalizationConfig
(Core/Models/NormalizationConfig.cs:22-135).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

NONE_COLS = {
    "01_dir_candle_direction", "01_dir_mean_reversion_prob", "01_dir_momentum_accel",
    "01_dir_price_position", "01_dir_trend_efficiency", "01_dir_vol_mom_correlation",
    "01_dir_volume_direction", "01_dir_volume_pressure",
    "02_cyclical_phase", "02_market_stress", "02_regime_directional_bias",
    "02_regime_duration_norm", "02_regime_momentum", "02_trend_efficiency",
    "02_trend_mtf_alignment", "02_trend_mtf_strength", "02_vol_trend",
    "03_micro_buy_pressure", "03_micro_flow_acceleration", "03_micro_flow_imbalance",
    "03_micro_pressure_diff", "03_micro_price_efficiency", "03_micro_sell_pressure",
    "03_micro_spike_direction", "03_micro_spread_zscore", "03_micro_tick_direction",
    "03_micro_volume_spike", "03_micro_vwap_deviation",
    "04_tech_bb_expansion", "04_tech_bb_squeeze", "04_tech_ma_alignment",
    "04_tech_ma_convergence", "04_tech_ma_dev_21", "04_tech_ma_dev_9",
    "04_tech_macd_normalized", "04_tech_macd_quality", "04_tech_rsi_composite",
    "04_tech_rsi_normalized", "04_tech_vol_percentile",
    "05_pos_long_entry_score", "05_pos_long_trailing_active", "05_pos_mtf_consensus",
    "05_pos_mtf_long_alignment", "05_pos_mtf_short_alignment", "05_pos_resistance_strength",
    "05_pos_short_entry_score", "05_pos_short_trailing_active", "05_pos_support_strength",
    "06_dl_input_gate", "06_dl_pos_encoding_cos", "06_dl_pos_encoding_sin",
    "07_ml_hour_american", "07_ml_hour_asian", "07_ml_hour_european",
    "07_ml_price_percentile_50", "07_ml_price_volume_correlation", "07_ml_volume_percentile_50",
}
STANDARD_COLS = {
    "01_dir_pattern_strength", "03_micro_depth_imbalance", "04_tech_bb_position",
    "05_pos_long_max_favorable", "05_pos_short_max_favorable", "05_pos_stop_distance",
    "06_dl_layer_norm", "07_ml_composite_trend_score", "07_ml_composite_volatility_score",
}
ROBUST_COLS = {
    "01_dir_dm_minus", "01_dir_dm_plus", "01_dir_momentum_z10", "01_dir_momentum_z5",
    "01_dir_trend_strength",
    "02_hurst_exponent", "02_market_condition_score", "02_regime_confidence", "02_trend_quality",
    "03_micro_spread_volume_ratio", "03_micro_tick_clustering",
    "04_tech_atr_ratio", "04_tech_rsi_momentum",
    "05_pos_distance_to_long_entry", "05_pos_distance_to_short_entry", "05_pos_downside_risk",
    "05_pos_expected_long_duration", "05_pos_expected_short_duration", "05_pos_long_profit_potential",
    "05_pos_long_risk_reward", "05_pos_risk_asymmetry", "05_pos_short_profit_potential",
    "05_pos_short_risk_reward", "05_pos_upside_potential",
    "06_dl_attention_spread", "06_dl_bottleneck_feat", "06_dl_cycle_strength",
    "06_dl_encoded_seq", "06_dl_feature_robustness", "06_dl_forget_gate",
    "06_dl_node_importance", "06_dl_pattern_score", "06_dl_price_embedding",
    "06_dl_sequence_entropy",
    "07_ml_composite_momentum_score", "07_ml_market_quality_score", "07_ml_pct_change_lag_5",
    "07_ml_price_entropy", "07_ml_price_volume_covariance", "07_ml_price_zscore",
    "07_ml_returns_cubed", "07_ml_returns_squared", "07_ml_volume_entropy",
    "07_ml_volume_gini", "07_ml_volume_short_long_ratio", "07_ml_volume_zscore",
}
QUANTILE_COLS = {
    "05_pos_optimal_long_entry", "05_pos_optimal_short_entry",
    "06_dl_avgpool_price", "06_dl_context_strength", "06_dl_conv_3_price",
    "06_dl_conv_5_price", "06_dl_conv_7_price", "06_dl_conv_9_price",
    "06_dl_decoded_state", "06_dl_maxpool_price", "06_dl_multiscale_10",
    "06_dl_multiscale_20", "06_dl_multiscale_5", "06_dl_multiscale_50",
    "07_ml_price_lag_1", "07_ml_price_lag_3", "07_ml_price_lag_5",
}
MINMAX_COLS = {
    "01_dir_momentum_quality", "02_regime_stability", "02_regime_type",
    "03_micro_amihud_illiquidity", "03_micro_iceberg_pattern", "03_micro_stop_hunt",
    "03_micro_tick_intensity", "05_pos_long_expectancy", "05_pos_long_quality",
    "05_pos_long_success_prob", "05_pos_recommended_size_long", "05_pos_recommended_size_short",
    "05_pos_short_expectancy", "05_pos_short_quality", "05_pos_short_success_prob",
    "05_pos_size_confidence", "06_dl_sequence_complexity", "07_ml_price_bin", "07_ml_volume_bin",
}


def normalization_type(name: str) -> str:
    if name in NONE_COLS:
        return "none"
    if name in STANDARD_COLS:
        return "standard"
    if name in ROBUST_COLS:
        return "robust"
    if name in QUANTILE_COLS:
        return "quantile"
    if name in MINMAX_COLS:
        return "minmax"
    return "standard"  # default (NormalizationConfig.cs:130-135)


def collect_stats(features: pd.DataFrame, feature_cols: list[str]) -> pd.DataFrame:
    """Per-feature stats table: feature,count,mean,stddev,min,max,q1,median,q3,iqr.
    NaN/Inf values are skipped (FeatureStatisticsCollector.cs:94-97); exact
    quantiles with the reference's interpolation formula."""
    rows = []
    for c in feature_cols:
        v = features[c].to_numpy(dtype="float64")
        v = v[np.isfinite(v)]
        n = len(v)
        if n == 0:
            rows.append((c, 0, 0.0, 0.0, np.inf, -np.inf, 0.0, 0.0, 0.0, 0.0))
            continue
        mean = float(np.mean(v))
        std = float(np.std(v, ddof=1)) if n > 1 else 0.0
        q1, med, q3 = (float(np.percentile(v, p)) for p in (25, 50, 75))
        rows.append((c, n, mean, std, float(np.min(v)), float(np.max(v)),
                     q1, med, q3, q3 - q1))
    return pd.DataFrame(rows, columns=["feature", "count", "mean", "stddev",
                                       "min", "max", "q1", "median", "q3", "iqr"])


def normalize(features: pd.DataFrame, stats: pd.DataFrame,
              feature_cols: list[str]) -> pd.DataFrame:
    """DataNormalizer.NormalizeValue per column; label/timestamp copied."""
    st = stats.set_index("feature")
    out = features.copy()
    for c in feature_cols:
        v = out[c].to_numpy(dtype="float64").copy()
        bad = ~np.isfinite(v)  # NaN/Inf input -> 0.0 output (DataNormalizer.cs:160-161)
        s = st.loc[c]
        t = normalization_type(c)
        if t == "standard":
            nv = np.zeros_like(v) if s["stddev"] < 1e-10 else (v - s["mean"]) / s["stddev"]
        elif t == "robust":
            nv = np.zeros_like(v) if s["iqr"] < 1e-10 else (v - s["median"]) / s["iqr"]
        elif t == "quantile":
            rng = s["max"] - s["min"]
            nv = (np.full_like(v, 0.5) if rng < 1e-10
                  else np.clip((v - s["min"]) / rng, 0.0, 1.0))
        elif t == "minmax":
            rng = s["max"] - s["min"]
            nv = (np.zeros_like(v) if rng < 1e-10
                  else 2 * (v - s["min"]) / rng - 1)
        else:
            nv = v
        nv = np.asarray(nv, dtype="float64").copy()
        nv[bad] = 0.0
        out[c] = nv
    return out
