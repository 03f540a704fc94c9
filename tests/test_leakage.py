"""Zero-temporal-leakage property (SURVEY §5.4a): truncate the input after a
cut point — every emitted row whose label window is fully inside the truncated
range must be BIT-IDENTICAL (features depend only on bars <= emission time;
the label only on its declared 600-tick forward window)."""

import numpy as np

from forex_feature_generator_spark import synth
from forex_feature_generator_spark.engine import features as efeat
from forex_feature_generator_spark.engine import labels as elab
from forex_feature_generator_spark.oracle import pipeline as opipe
from tests.test_bars import oracle_bars_df


def test_no_temporal_leakage():
    ticks = synth.gen_ticks(n_sources=1, ticks_per_source=6000, hot_sources=0,
                            seed=5, mean_gap_s=6.0)
    cut = 4500
    trunc = ticks.iloc[:cut]

    full_m1 = oracle_bars_df(ticks, 1)
    full_m5 = oracle_bars_df(ticks, 5)
    tr_m1 = oracle_bars_df(trunc, 1)
    tr_m5 = oracle_bars_df(trunc, 5)

    f_full = efeat.compute_features_pdf(full_m1, full_m5)
    f_tr = efeat.compute_features_pdf(tr_m1, tr_m5)

    # overlap: rows emitted in BOTH runs with identical visible state, i.e.
    # bars whose completion tick exists in the truncated set and whose m5
    # visibility is unchanged -> compare rows present in the truncated output
    common = set(f_tr["ts_us"]) & set(f_full["ts_us"])
    a = f_full[f_full.ts_us.isin(common)].sort_values("ts_us").reset_index(drop=True)
    b = f_tr[f_tr.ts_us.isin(common)].sort_values("ts_us").reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 50
    for c in opipe.FEATURE_NAMES:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy(), equal_nan=True), c

    # labels: identical whenever the full 600-tick window fits in the prefix
    bid = ticks["bid"].to_numpy()
    ask = ticks["ask"].to_numpy()
    ent_full = a["completion_seq"].to_numpy("int64")
    lab_full = elab.compute_labels(ent_full, bid, ask)
    lab_tr = elab.compute_labels(b["completion_seq"].to_numpy("int64"),
                                 trunc["bid"].to_numpy(), trunc["ask"].to_numpy())
    fits = ent_full + 600 < cut
    assert fits.sum() > 20
    assert (lab_full[fits] == lab_tr[fits]).all()
