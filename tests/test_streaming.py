"""Streaming bars == batch bars on a bounded replay (event-time only, so the
availableNow replay must agree with the batch aggregation for every window
the watermark closed)."""

import numpy as np

from forex_feature_generator_spark import synth
from forex_feature_generator_spark.engine import bars as ebars
from forex_feature_generator_spark.engine import streaming as estream


def test_streaming_bars_match_batch(spark, tmp_path, small_ticks):
    src_dir = str(tmp_path / "ticks_in")
    out_dir = str(tmp_path / "bars_out")
    ckpt = str(tmp_path / "ckpt")
    sdf = spark.createDataFrame(small_ticks)
    sdf.write.parquet(src_dir)

    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (estream.streaming_bars(stream, 1)
         .writeStream.format("parquet")
         .option("path", out_dir).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = (spark.read.parquet(out_dir)
           .orderBy("source", "bar_ts_us").toPandas())
    batch = (ebars.aggregate_bars(ebars.with_tick_direction(sdf), 1)
             .orderBy("source", "bar_ts_us").toPandas())

    # append-mode emits only watermark-closed windows; every emitted bar must
    # exactly match its batch counterpart, and coverage must be near-complete
    bkey = batch.set_index(["source", "bar_ts_us"])
    assert len(got) >= 0.9 * len(batch)
    merged = got.join(bkey, on=["source", "bar_ts_us"], how="inner",
                      rsuffix="_b")
    assert len(merged) == len(got[got.set_index(["source", "bar_ts_us"]).index
                                  .isin(bkey.index)])
    for c in ("open", "high", "low", "close"):
        np.testing.assert_array_equal(merged[c].to_numpy(),
                                      merged[f"{c}_b"].to_numpy(), err_msg=c)
    np.testing.assert_array_equal(merged["tick_volume"].to_numpy(),
                                  merged["tick_volume_b"].to_numpy())
    np.testing.assert_allclose(merged["avg_spread"], merged["avg_spread_b"],
                               rtol=1e-12)
