"""Property-based parity: the vectorized label kernel vs the line-faithful
LabelGenerator transcription on adversarial price paths (no Spark needed —
both sides are pure Python/numpy, so hypothesis can explore freely)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from forex_feature_generator_spark.engine.labels import compute_labels
from forex_feature_generator_spark.oracle.labels import (LabelConfig,
                                                         generate_label,
                                                         generate_label_result)

FIELDS = ["label", "confidence", "long_profit_pips", "short_profit_pips",
          "mae_pips", "mfe_pips", "time_to_target", "risk_reward",
          "quality_score"]


@st.composite
def price_paths(draw):
    """Random-walk bid series with adversarial regimes: flat plateaus, pip-
    scale oscillation near the trigger/trail thresholds, jumps, and spread
    regimes that flip the inferred stop loss."""
    n = draw(st.integers(min_value=30, max_value=700))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    regime = draw(st.sampled_from(["calm", "trending", "jumpy", "flat"]))
    spread_pips = draw(st.sampled_from([0.5, 1.5, 3.0]))
    rng = np.random.default_rng(seed)
    if regime == "flat":
        steps = np.zeros(n)
        steps[rng.random(n) < 0.05] = 1e-4      # rare 1-pip moves
    elif regime == "calm":
        steps = rng.normal(0, 0.3e-4, n)
    elif regime == "trending":
        steps = rng.normal(0.4e-4, 0.6e-4, n)   # drifts through TP/trail
    else:
        steps = rng.normal(0, 2.5e-4, n)        # jumps through SL in one tick
    bid = 1.10 + np.cumsum(steps)
    ask = bid + spread_pips * 1e-4
    n_entries = draw(st.integers(min_value=1, max_value=8))
    entries = np.sort(rng.integers(0, n - 1, size=n_entries)).astype("int64")
    return bid, ask, entries


@given(price_paths())
@settings(max_examples=120, deadline=None)
def test_labels_match_oracle_on_random_paths(path):
    bid, ask, entries = path
    cfg = LabelConfig()
    got = compute_labels(entries, bid, ask, cfg, chunk=3,
                         return_metadata=True)
    for i, e in enumerate(entries):
        fut_b = bid[e + 1:e + 1 + cfg.max_future_ticks]
        fut_a = ask[e + 1:e + 1 + cfg.max_future_ticks]
        exp = generate_label_result(cfg, float(bid[e]), float(ask[e]),
                                    fut_b, fut_a)
        assert int(got.iloc[i]["label"]) == generate_label(
            cfg, float(bid[e]), float(ask[e]), fut_b, fut_a)
        for f in FIELDS:
            assert np.isclose(got.iloc[i][f], exp[f], rtol=1e-9, atol=1e-12), (
                int(e), f, float(got.iloc[i][f]), exp[f])
