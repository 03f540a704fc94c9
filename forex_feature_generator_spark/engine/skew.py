"""Salted halo-chunking for hot sources (SURVEY §4 axis B).

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

Chunk-0 caveat: the absolute-run-count gates (warm-up 260, emission-state
counts <= 110) only affect bar indices < ~560, which always live in chunk 0
with a complete prefix — later chunks pass every gate, and their ring-buffer
reads stay inside the halo."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle.labels import LabelConfig
from ..oracle.pipeline import FEATURE_NAMES
from . import bars as ebars
from .features import compute_features_pdf, WARMUP_BARS
from .labels import compute_labels
from .pipeline import FEATURES_SCHEMA, LABELS_SCHEMA

M1_HALO = 620
M5_HALO = 620
LABEL_HALO = 600


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


def _features_chunk_fn(warmup_bars: int):
    def fn(key, m1_pdf, m5_pdf):
        source, chunk = key[0], key[1]
        if m1_pdf.empty:
            return pd.DataFrame(columns=["source", "ts_us", "timestamp",
                                         "completion_seq"] + FEATURE_NAMES)
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
        return out
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
                        label_cfg: LabelConfig | None = None) -> DataFrame:
    """Halo-chunked variant of engine.pipeline.run_pipeline — identical
    results, hot sources split into bounded parallel tasks."""
    cfg = label_cfg or LabelConfig()
    # The cogroup sides here are independent plans that happen to share leaf
    # attribute ids (both trace to `ticks`); the dataset-id heuristic flags
    # them as an ambiguous self-join even though key resolution is positional
    # and well-defined. Disable the heuristic for this session.
    spark.conf.set("spark.sql.analyzer.failAmbiguousSelfJoin", "false")
    if "seq" not in ticks.columns:
        ticks = ebars.with_seq(ticks)
    ticks = ticks.persist()
    td = ebars.with_tick_direction(ticks)
    m1 = ebars.aggregate_bars(td, 1).persist()
    m5 = ebars.aggregate_bars(td, 5).persist()

    # The bounds table is tiny (one row per source-chunk). Materialize it on
    # the driver and re-create it: breaks the shared lineage with m1/m5 (which
    # would otherwise trip Spark's ambiguous-self-join detection inside the
    # cogroups) and makes the broadcast explicit.
    bounds_pdf = _chunk_bounds(m1, m5, chunk_bars).toPandas()

    def b():
        # fresh dataset per use site — cogroup sides must not share lineage
        return F.broadcast(spark.createDataFrame(bounds_pdf))

    # replicate m1 bars into [b_lo - M1_HALO, b_hi]
    m1r = (m1.join(b().select("source", "chunk",
                            (F.col("b_lo") - F.lit(M1_HALO)).alias("rlo"),
                            F.col("b_hi").alias("rhi"),
                            F.col("b_lo").alias("emit_lo")),
                   "source")
           .filter((F.col("bar_index") >= F.col("rlo"))
                   & (F.col("bar_index") <= F.col("rhi")))
           .drop("rlo", "rhi"))
    # replicate m5 bars into visible range [m5c_start - M5_HALO, m5c_end)
    m5r = (m5.join(b().select("source", "chunk",
                            (F.col("m5c_start") - F.lit(M5_HALO)).alias("rlo"),
                            F.col("m5c_end").alias("rhi")),
                   "source")
           .filter((F.col("bar_index") >= F.col("rlo"))
                   & (F.col("bar_index") < F.col("rhi")))
           .drop("rlo", "rhi"))

    features = (m1r.groupBy("source", "chunk")
                .cogroup(m5r.groupBy("source", "chunk"))
                .applyInPandas(_features_chunk_fn(warmup_bars),
                               schema=FEATURES_SCHEMA))

    # labels: emissions chunked the same way; ticks replicated per chunk with
    # the +600 forward halo
    emissions = (m1.filter(F.col("bar_index") >= warmup_bars)
                 .withColumn("chunk", (F.col("bar_index") / F.lit(chunk_bars)).cast("long"))
                 .select("source", "chunk", F.col("bar_ts_us").alias("ts_us"),
                         "completion_seq"))
    tick_ranges = b().select("source", "chunk",
                           F.col("comp_lo").alias("t_lo"),
                           (F.col("comp_hi") + F.lit(LABEL_HALO)).alias("t_hi"))
    ticks_r = (ticks.select("source", "seq", "bid", "ask")
               .join(tick_ranges, "source")
               .filter((F.col("seq") >= F.col("t_lo")) & (F.col("seq") <= F.col("t_hi")))
               .drop("t_lo", "t_hi"))
    labels = (emissions.groupBy("source", "chunk")
              .cogroup(ticks_r.groupBy("source", "chunk"))
              .applyInPandas(_labels_chunk_fn(cfg), schema=LABELS_SCHEMA))

    return (features.join(F.broadcast(labels), ["source", "ts_us"], "inner")
            .select("source", "ts_us", *FEATURE_NAMES, "label", "timestamp"))
