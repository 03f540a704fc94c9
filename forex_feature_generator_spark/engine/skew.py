"""Salted halo-chunking for hot sources (SURVEY §4 axis B) — the DEFAULT
execution path (spark_submit_main).

Per-entity windows are order-dependent, so plain salting would corrupt them.
Instead each hot source's bar stream is cut into fixed-size chunks that carry
a read-only HALO of preceding state:

  * M1 halo: 620 bars = 499 (anchored window) + ~100 (deepest emission-state
    ring: regime duration walks 100 previous emissions) + slack
  * M5 halo: 620 visible M5 bars before the chunk's first emission, located
    exactly via an as-of count of completed M5 bars at the chunk boundary
  * label halo: ticks up to completion_seq(last bar) + 600 forward ticks

Each chunk computes features/labels with full fidelity and EMITS only its own
bar range, so results are bit-identical to the unsalted run (verified by
tests/test_skew.py) while a 10x-hot source becomes ceil(n/chunk) parallel
tasks instead of one straggler.

Scale shape of the replication joins: a naive equi-join on `source` followed
by a range filter generates |rows| x |chunks-per-source| candidates — at
100 TB a hot source has thousands of chunks and the join itself becomes
quadratic. Instead every range [lo, hi] is EXPLODED into the coarse buckets it
overlaps and the join key is (source, bucket): each row probes O(1) candidate
ranges regardless of how many chunks the source has, and the key carries the
bucket so hot sources no longer skew the join either. The bounds table (one
row per source-chunk) stays distributed — no driver toPandas(); lineage to
m1/m5 is broken with an RDD round-trip so the joins cannot alias-collide.

Chunk-0 caveat: the absolute-run-count gates (warm-up 260, emission-state
counts <= 110) only affect bar indices < ~560, which always live in chunk 0
with a complete prefix — later chunks pass every gate, and their ring-buffer
reads stay inside the halo.

Residual per-source work: NOTHING tick-sized sorts per source anymore
(direction lives in the bar groupBy); the remaining partitionBy(source)
windows (bar completion/index, chunk bounds) run over BARS — 1-3 orders of
magnitude smaller than ticks (a decade of minute bars is ~5M narrow rows,
one bounded sort task). If even that binds, pass bucketed_bar_order=True:
engine/bars.py::with_ordered_neighbors computes the completion lead /
bar_index / boundary lag through day-bucket windows plus a per-bucket
boundary patch — every sort task bounded by 1440 rows regardless of source
heat, bit-identical results (tests/test_bars.py, test_skew.py). Default off:
at bench scale the extra join/shuffle measures ~20% slower than the
per-source window, which is cheap there; flip it when a single source's bar
count makes one sort task the straggler."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle.labels import LabelConfig
from ..oracle.pipeline import FEATURE_NAMES
from . import bars as ebars
from .features import compute_features_pdf, WARMUP_BARS
from .labels import compute_labels
from .pipeline import (FEATURES_LABELED_SCHEMA, LABELS_SCHEMA, attach_label,
                       unambiguous_self_join)

M1_HALO = 620
M5_HALO = 620
LABEL_HALO = 600
TICK_BUCKET = 1 << 16


def _chunk_bounds(m1: DataFrame, m5: DataFrame, chunk_bars: int) -> DataFrame:
    """Per (source, chunk): m1 bar-index range, tick range, and the visible-M5
    global-index range (as-of counts at the chunk boundaries)."""
    c = (m1.withColumn("chunk", (F.col("bar_index") / F.lit(chunk_bars)).cast("long"))
         .groupBy("source", "chunk")
         .agg(F.min("bar_index").alias("b_lo"), F.max("bar_index").alias("b_hi"),
              F.min("completion_seq").alias("comp_lo"),
              F.max("completion_seq").alias("comp_hi"),
              F.min("first_seq").alias("tick_lo")))
    # as-of: number of m5 bars completed at or before each chunk boundary.
    # Sorted-merge as-of (union + forward-fill window) — a non-equi join here
    # would be a nested-loop explosion (measured ~700 CPU-s at 15M ticks).
    from .windows import asof_join_backward
    m5b = m5.select("source", F.col("completion_seq").alias("m5_comp"),
                    F.col("bar_index").alias("m5_idx"))
    start = (asof_join_backward(c.select("source", "chunk", "comp_lo"),
                                m5b, ["source"], "comp_lo", "m5_comp", ["m5_idx"])
             .select("source", "chunk",
                     (F.coalesce(F.col("m5_idx") + 1, F.lit(0))).alias("m5c_start")))
    end = (asof_join_backward(c.select("source", "chunk", "comp_hi"),
                              m5b, ["source"], "comp_hi", "m5_comp", ["m5_idx"])
           .select("source", "chunk",
                   (F.coalesce(F.col("m5_idx") + 1, F.lit(0))).alias("m5c_end")))
    return (c.join(start, ["source", "chunk"]).join(end, ["source", "chunk"]))


def _bucketed(bounds_sel: DataFrame, lo: str, hi: str, bucket: int) -> DataFrame:
    """Explodes each [lo, hi] range row into the coarse buckets it overlaps so
    the replication join can use (source, bkt) as an equi key."""
    return bounds_sel.withColumn(
        "bkt", F.explode(F.sequence(F.floor(F.col(lo) / F.lit(bucket)),
                                    F.floor(F.col(hi) / F.lit(bucket)))))


def _features_chunk_fn(warmup_bars: int):
    def fn(key, m1_pdf, m5_pdf):
        source, chunk = key[0], key[1]
        if m1_pdf.empty:
            return pd.DataFrame(columns=["source", "ts_us", "timestamp",
                                         "completion_seq"] + FEATURE_NAMES + ["label"])
        m1_pdf = m1_pdf.sort_values("bar_index").reset_index(drop=True)
        m5_pdf = m5_pdf.sort_values("bar_index").reset_index(drop=True)
        lo = int(m1_pdf["emit_lo"].iloc[0])
        base = int(m1_pdf["bar_index"].min())
        m5_base = int(m5_pdf["bar_index"].min()) if len(m5_pdf) else 0
        out = compute_features_pdf(
            m1_pdf, m5_pdf, warmup_bars=warmup_bars,
            bar_index_offset=base, m5_index_offset=m5_base)
        out = (out[out["bar_index"] >= lo] if len(out) else out).drop(
            columns=["bar_index"])
        out["source"] = source
        return attach_label(out, m1_pdf)
    return fn


def _labels_chunk_fn(cfg: LabelConfig):
    def fn(key, em_pdf, ticks_pdf):
        source = key[0]
        if em_pdf.empty or ticks_pdf.empty:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "ts_us": pd.Series(dtype="int64"),
                                 "label": pd.Series(dtype="int32")})
        t = ticks_pdf.sort_values("seq")
        seq0 = int(t["seq"].min())
        labels = compute_labels(
            em_pdf["completion_seq"].to_numpy("int64") - seq0,
            t["bid"].to_numpy("float64"), t["ask"].to_numpy("float64"), cfg)
        return pd.DataFrame({"source": source,
                             "ts_us": em_pdf["ts_us"].to_numpy("int64"),
                             "label": labels.astype("int32")})
    return fn


def run_pipeline_salted(spark: SparkSession, ticks: DataFrame,
                        chunk_bars: int = 4000,
                        warmup_bars: int = WARMUP_BARS,
                        label_cfg: LabelConfig | None = None,
                        cache_ticks: bool = True,
                        bucketed_bar_order: bool = False,
                        burst_subbars: int | None = None) -> DataFrame:
    """Halo-chunked variant of engine.pipeline.run_pipeline — identical
    results, hot sources split into bounded parallel tasks.

    cache_ticks: the tick table is consumed twice (bar pass + label halo
    replication). Caching wins at bench scale, but at 100 TB a full-table
    persist churns the block store — pass False there and let both consumers
    re-scan the columnar source (pruned to 5 columns)."""
    cfg = label_cfg or LabelConfig()
    if "seq" not in ticks.columns:
        ticks = ebars.with_seq(ticks)
    if cache_ticks:
        ticks = ticks.persist()
    # the whole plan construction derives from one tick scan, so it runs
    # under the scoped self-join-heuristic override (engine/pipeline.py) —
    # restored before this function returns
    with unambiguous_self_join(spark):
        # one tick-sized pass (see engine/pipeline.py): direction inside the bar
        # groupBy, M5 derived from the persisted partial M1 bars
        base = ebars.aggregate_bars_partial(
            ticks, 1, bucketed_order=bucketed_bar_order,
            burst_subbars=burst_subbars).persist()
        m1 = ebars.finish_bars(base, bucketed_order=bucketed_bar_order).persist()
        m5 = ebars.finish_bars(ebars.bars_from_lower(base, 5),
                               bucketed_order=bucketed_bar_order).persist()

        # The bounds table is tiny (one row per source-chunk) and STAYS
        # distributed. The RDD round-trip breaks the shared lineage with m1/m5
        # (fresh attribute ids) so the replication joins below cannot resolve the
        # two sides to the same attributes; persist so it computes once.
        raw_bounds = _chunk_bounds(m1, m5, chunk_bars)
        bounds = spark.createDataFrame(raw_bounds.rdd, raw_bounds.schema).persist()

        # --- labels first: one cogroup over (emissions, haloed ticks) per chunk
        emissions = (m1.filter(F.col("bar_index") >= warmup_bars)
                     .withColumn("chunk", (F.col("bar_index") / F.lit(chunk_bars)).cast("long"))
                     .select("source", "chunk", F.col("bar_ts_us").alias("ts_us"),
                             "completion_seq"))
        tick_ranges = _bucketed(
            bounds.select("source", "chunk",
                          F.col("comp_lo").alias("t_lo"),
                          (F.col("comp_hi") + F.lit(LABEL_HALO)).alias("t_hi")),
            "t_lo", "t_hi", TICK_BUCKET)
        ticks_r = (ticks.select("source", "seq", "bid", "ask")
                   .withColumn("bkt", F.floor(F.col("seq") / F.lit(TICK_BUCKET)))
                   .join(tick_ranges, ["source", "bkt"])
                   .filter((F.col("seq") >= F.col("t_lo")) & (F.col("seq") <= F.col("t_hi")))
                   .drop("bkt", "t_lo", "t_hi"))
        labels = (emissions.groupBy("source", "chunk")
                  .cogroup(ticks_r.groupBy("source", "chunk"))
                  .applyInPandas(_labels_chunk_fn(cfg), schema=LABELS_SCHEMA))

        # fuse: labels joined onto the NARROW bar stream before replication, so
        # the wide feature output is never shuffled or broadcast (labels come out
        # of applyInPandas with fresh attributes)
        m1l = m1.join(labels.select("source", F.col("ts_us").alias("bar_ts_us"),
                                    "label"),
                      ["source", "bar_ts_us"], "left")

        # replicate m1 bars into [b_lo - M1_HALO, b_hi]
        m1_ranges = _bucketed(
            bounds.select("source", "chunk",
                          (F.col("b_lo") - F.lit(M1_HALO)).alias("rlo"),
                          F.col("b_hi").alias("rhi"),
                          F.col("b_lo").alias("emit_lo")),
            "rlo", "rhi", chunk_bars)
        m1r = (m1l.withColumn("bkt", F.floor(F.col("bar_index") / F.lit(chunk_bars)))
               .join(m1_ranges, ["source", "bkt"])
               .filter((F.col("bar_index") >= F.col("rlo"))
                       & (F.col("bar_index") <= F.col("rhi")))
               .drop("bkt", "rlo", "rhi"))
        # replicate m5 bars into visible range [m5c_start - M5_HALO, m5c_end)
        m5_ranges = _bucketed(
            bounds.select("source", "chunk",
                          (F.col("m5c_start") - F.lit(M5_HALO)).alias("rlo"),
                          F.col("m5c_end").alias("rhi")),
            "rlo", "rhi", chunk_bars)
        m5r = (m5.withColumn("bkt", F.floor(F.col("bar_index") / F.lit(chunk_bars)))
               .join(m5_ranges, ["source", "bkt"])
               .filter((F.col("bar_index") >= F.col("rlo"))
                       & (F.col("bar_index") < F.col("rhi")))
               .drop("bkt", "rlo", "rhi"))

        features = (m1r.groupBy("source", "chunk")
                    .cogroup(m5r.groupBy("source", "chunk"))
                    .applyInPandas(_features_chunk_fn(warmup_bars),
                                   schema=FEATURES_LABELED_SCHEMA))
        return features.select("source", "ts_us", *FEATURE_NAMES, "label",
                               "timestamp")
