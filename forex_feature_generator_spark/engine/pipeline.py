"""End-to-end Spark pipeline (SURVEY §7.1):

ticks → [seq/secondary sort] → tick-direction window → M1/M5 tumbling bars
      → cogroup(M1, M5).applyInPandas feature kernel   (Arrow, per source)
      → cogroup(emissions, ticks).applyInPandas labels (Arrow, per source)
      → sort-merge join on (source, ts_us) → 150-column output

Shuffle budget: one exchange on `source` feeds the tick-direction window and
both bar aggregations (partial aggregation map-side); the two cogroups and the
final join all reuse source-hash partitioning. For hot sources see
engine/skew.py (salted halo-chunking)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle.labels import LabelConfig
from ..oracle.pipeline import FEATURE_NAMES
from . import bars as ebars
from .features import compute_features_pdf, WARMUP_BARS
from .labels import labels_for_source

FEATURES_SCHEMA = ("source string, ts_us long, timestamp long, completion_seq long, "
                   + ", ".join(f"`{c}` double" for c in FEATURE_NAMES))
LABELS_SCHEMA = "source string, ts_us long, label int"


def _features_fn(warmup_bars: int):
    def fn(key, m1_pdf, m5_pdf):
        out = compute_features_pdf(m1_pdf, m5_pdf, warmup_bars=warmup_bars)
        out = out.drop(columns=["bar_index"])
        out["source"] = key[0]
        return out
    return fn


def _labels_fn(cfg: LabelConfig):
    def fn(key, emissions_pdf, ticks_pdf):
        import pandas as pd
        if emissions_pdf.empty or ticks_pdf.empty:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "ts_us": pd.Series(dtype="int64"),
                                 "label": pd.Series(dtype="int32")})
        out = labels_for_source(emissions_pdf, ticks_pdf, cfg)
        out.insert(0, "source", key[0])
        out["label"] = out["label"].astype("int32")
        return out
    return fn


def run_pipeline(spark: SparkSession, ticks: DataFrame,
                 warmup_bars: int = WARMUP_BARS,
                 label_cfg: LabelConfig | None = None,
                 cache_ticks: bool = True) -> DataFrame:
    """ticks: (source, ts, bid, ask[, seq]). Returns the feature+label rows:
    (source, ts_us, <148 features>, label, timestamp)."""
    cfg = label_cfg or LabelConfig()
    if "seq" not in ticks.columns:
        ticks = ebars.with_seq(ticks)
    if cache_ticks:
        ticks = ticks.persist()

    td = ebars.with_tick_direction(ticks)
    m1 = ebars.aggregate_bars(td, 1)
    m5 = ebars.aggregate_bars(td, 5)

    features = (
        m1.groupBy("source").cogroup(m5.groupBy("source"))
        .applyInPandas(_features_fn(warmup_bars), schema=FEATURES_SCHEMA)
    )

    emissions = (m1.filter(F.col("bar_index") >= warmup_bars)
                 .select("source", F.col("bar_ts_us").alias("ts_us"), "completion_seq"))
    labels = (
        emissions.groupBy("source")
        .cogroup(ticks.select("source", "seq", "bid", "ask").groupBy("source"))
        .applyInPandas(_labels_fn(cfg), schema=LABELS_SCHEMA)
    )

    # labels are 3 narrow columns — broadcast them so the 150-column feature
    # side is never shuffled for the join
    result = (features.join(F.broadcast(labels), ["source", "ts_us"], "inner")
              .select("source", "ts_us", *FEATURE_NAMES, "label", "timestamp"))
    return result


# FeatureConfiguration equivalent (SURVEY §2.10): calculator enable/disable
# maps to column selection — the vectorized kernel computes the full vector
# (its intermediates are shared across calculators, so per-calculator skipping
# saves little), and gating is a free projection that Catalyst prunes.
CALCULATOR_PREFIXES = {
    "Directional": "01_dir_",
    "MarketRegimeContext": "02_",
    "MicrostructureOrderFlow": "03_micro_",
    "TechnicalIndicators": "04_tech_",
    "Position": "05_pos_",
    "DeepLearning": "06_dl_",
    "MachineLearning": "07_ml_",
}


def select_calculators(df: DataFrame, enabled: list[str]) -> DataFrame:
    """Keeps only the feature columns of the enabled calculators (plus all
    non-feature columns) — FeaturePipeline.RegisterCalculator + IsFeatureEnabled."""
    prefixes = tuple(CALCULATOR_PREFIXES[name] for name in enabled)
    keep = [c for c in df.columns
            if not c[:1].isdigit() or c.startswith(prefixes)]
    return df.select(*keep)


def write_output(df: DataFrame, path: str, partition_by_source: bool = True) -> None:
    w = df.write.mode("overwrite").option("compression", "snappy")
    if partition_by_source:
        w = w.partitionBy("source")
    w.parquet(path)
