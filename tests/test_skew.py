"""Salted halo-chunked execution must be indistinguishable from the plain
per-source run (north-rule property: partitioning/salting invariance)."""

import numpy as np
import pytest

from forex_feature_generator_spark import synth
from forex_feature_generator_spark.engine import pipeline as epipe
from forex_feature_generator_spark.engine import skew as eskew
from forex_feature_generator_spark.oracle import pipeline as opipe


@pytest.mark.parametrize("chunk_bars,seed,cache,bucketed", [
    (300, 17, True, False),   # halos genuinely truncate the prefix
    (137, 5, False, False),   # odd chunk + uncached ticks (100 TB posture)
    (300, 17, True, True),    # bucketed bar ordering (no per-source bar sort)
])
def test_salted_equals_unsalted(spark, chunk_bars, seed, cache, bucketed):
    ticks = synth.gen_ticks(n_sources=2, ticks_per_source=15000, hot_sources=1,
                            hot_factor=2, seed=seed, mean_gap_s=6.0)
    sdf = spark.createDataFrame(ticks)
    conf_key = "spark.sql.analyzer.failAmbiguousSelfJoin"
    conf_before = spark.conf.get(conf_key)
    plain = (epipe.run_pipeline(spark, sdf)
             .orderBy("source", "ts_us").toPandas())
    salted = (eskew.run_pipeline_salted(spark, sdf, chunk_bars=chunk_bars,
                                        cache_ticks=cache,
                                        bucketed_bar_order=bucketed)
              .orderBy("source", "ts_us").toPandas())
    # the self-join heuristic override is scoped to the fusion-join
    # construction — no session-global conf mutation survives the run
    assert spark.conf.get(conf_key) == conf_before == "true"
    assert len(plain) == len(salted) and len(plain) > 1000
    assert (plain["ts_us"].to_numpy() == salted["ts_us"].to_numpy()).all()
    assert (plain["label"].to_numpy() == salted["label"].to_numpy()).all()
    assert (plain["timestamp"].to_numpy() == salted["timestamp"].to_numpy()).all()
    for c in opipe.FEATURE_NAMES:
        a = plain[c].to_numpy()
        b = salted[c].to_numpy()
        assert np.allclose(a, b, rtol=1e-12, atol=1e-14), (
            c, float(np.abs(a - b).max()))
