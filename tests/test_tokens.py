"""North-rule tokens-table pipeline: window features vs pandas reference,
byte-identical tokens pass-through, 148-feature surface plumbing."""

import numpy as np
import pandas as pd

from forex_feature_generator_spark import synth
from forex_feature_generator_spark.engine import tokens as etok
from forex_feature_generator_spark.oracle.pipeline import FEATURE_NAMES


def _sdf(spark, pdf):
    return spark.createDataFrame(pdf[["doc_id", "tokens", "n_tok", "source"]])


def test_window_features_vs_pandas(spark):
    seqs = synth.gen_sequences(n_sources=4, n_rows=2000, seed=13)
    got = (etok.window_features(_sdf(spark, seqs))
           .orderBy("source", "doc_id").toPandas())

    # pandas reference per source
    for src, g in got.groupby("source"):
        close = g["close"].to_numpy()
        np.testing.assert_allclose(
            g["close_rmean20"].to_numpy(),
            pd.Series(close).rolling(20, min_periods=1).mean().to_numpy(),
            rtol=1e-12, err_msg="rolling mean")
        np.testing.assert_allclose(
            g["close_rmax20"].to_numpy(),
            pd.Series(close).rolling(20, min_periods=1).max().to_numpy(),
            rtol=0, err_msg="rolling max")
        lag1 = np.concatenate([[np.nan], close[:-1]])
        np.testing.assert_allclose(g["close_lag1_delta"].to_numpy(),
                                   close - lag1, rtol=1e-12, equal_nan=True)
        lead1 = np.concatenate([close[1:], [np.nan]])
        np.testing.assert_allclose(g["close_lead1_delta"].to_numpy(),
                                   lead1 - close, rtol=1e-12, equal_nan=True)
        # decayed mean: explicit loop reference
        n = len(close)
        exp = np.empty(n)
        for i in range(n):
            wdw = close[max(0, i - 19):i + 1]
            wts = 0.9 ** np.arange(len(wdw) - 1, -1, -1)
            exp[i] = (wdw * wts).sum() / wts.sum()
        np.testing.assert_allclose(g["close_ema20"].to_numpy(), exp, rtol=1e-9)
        # backfill
        sparse = np.where(np.arange(n) % 7 == 0, close, np.nan)
        ff = pd.Series(sparse).ffill().to_numpy()
        np.testing.assert_allclose(g["close_backfilled"].to_numpy(), ff, rtol=0)


def test_tokens_byte_identical_passthrough(spark):
    seqs = synth.gen_sequences(n_sources=2, n_rows=900, seed=21)
    out = (etok.window_features(_sdf(spark, seqs))
           .select("doc_id", "tokens").orderBy("doc_id").toPandas())
    exp = seqs.sort_values("doc_id").reset_index(drop=True)
    assert (out["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    for got_t, exp_t in zip(out["tokens"], exp["tokens"]):
        a = np.asarray(got_t, dtype=np.int32)
        b = np.asarray(exp_t, dtype=np.int32)
        assert a.tobytes() == b.tobytes()


def test_full_features_surface(spark):
    # one source with > 261 rows so the 148-feature kernel emits
    seqs = synth.gen_sequences(n_sources=1, n_rows=400, seed=33)
    out = etok.full_features(_sdf(spark, seqs)).toPandas()
    assert len(out) > 100
    assert set(FEATURE_NAMES).issubset(out.columns)
    feats = out[FEATURE_NAMES].to_numpy()
    assert np.isfinite(feats).all()
    assert np.abs(feats).max() <= 10.0
    # pass-through intact on the feature surface too
    src = seqs.set_index("doc_id")
    for _, row in out.head(50).iterrows():
        a = np.asarray(row["tokens"], dtype=np.int32)
        b = np.asarray(src.loc[row["doc_id"], "tokens"], dtype=np.int32)
        assert a.tobytes() == b.tobytes()
