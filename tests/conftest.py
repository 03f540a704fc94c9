import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from forex_feature_generator_spark.engine.session import get_spark
    s = get_spark("ffg-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_ticks():
    from forex_feature_generator_spark import synth
    # 2 sources, ~460 minutes each -> ~440+ M1 bars, ~90 M5 bars
    return synth.gen_ticks(n_sources=2, ticks_per_source=3400, hot_sources=0,
                           seed=7, mean_gap_s=6.0)
