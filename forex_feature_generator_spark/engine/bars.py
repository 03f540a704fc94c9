"""Tumbling-window OHLC bar aggregation — Spark-first re-expression of
BarAggregator.cs:34-141 (see oracle/bars.py for the sequential semantics).

Plan shape (one shuffle on `source` for the tick-direction window, then a
partial-aggregated groupBy on (source, bar_ts) whose shuffle moves only bars):

  ticks --window lag(bid) over (source, seq)--> tick direction
        --groupBy(source, bar_ts): min_by/max_by/agg--> bars
        --window lead over (source, bar_ts)--> completion tick + last-bar drop

Reference semantics preserved:
  * bar_ts = integer floor of tick ts to the timeframe
  * up/down tick direction vs previous bid ACROSS bar boundaries; the very
    first tick of a source has no direction (_lastBid == 0 guard)
  * a bar is complete only when a later tick exists -> the final bar per
    source is dropped; `completion_seq`/`completion_ts` identify the tick
    that completed the bar (the first tick of the next bar) — this is the
    as-of key for the M5->M1 join and the label entry tick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_MIN = 60_000_000

# one day of M1 bars per ordering bucket (<=1440 rows per in-bucket sort)
ORDER_BUCKET_MINUTES = 1440


def with_ordered_neighbors(bars: DataFrame,
                           prev_cols: dict[str, str] | None = None,
                           next_cols: dict[str, str] | None = None,
                           with_index: bool = False,
                           bucket_minutes: int | None = None) -> DataFrame:
    """lag / lead / row_number over (source, bar_ts_us) order WITHOUT a
    per-source global sort — the bucketed-range escape hatch for the last
    partitionBy(source) windows (SURVEY §4 axis B; engine/skew.py intro).

    Shape: bars are windowed within (source, time-bucket) — every sort task
    is bounded by the bucket size (<=1440 M1 bars/day) no matter how hot the
    source — then a ONE-ROW-PER-BUCKET summary table (|bars|/1440) carries
    each bucket's first/last values, cumulative row offsets, and the
    neighbouring buckets' boundary values via small per-source windows; a
    co-partitioned equi-join on (source, bucket) patches the bucket-edge rows
    and adds the global index. prev/next source columns must be non-null
    (first_seq / close are), so a null lag/lead means 'bucket edge'.

    prev_cols / next_cols: {output_name: source_column}."""
    prev_cols = prev_cols or {}
    next_cols = next_cols or {}
    # read at call time so tests can shrink the bucket to force boundaries
    bucket_us = (bucket_minutes or ORDER_BUCKET_MINUTES) * US_PER_MIN
    b = bars.withColumn("__bkt", F.floor(F.col("bar_ts_us") / F.lit(bucket_us)))
    w = Window.partitionBy("source", "__bkt").orderBy("bar_ts_us")
    proj = [F.lead(src).over(w).alias(f"__n_{out}")
            for out, src in next_cols.items()]
    proj += [F.lag(src).over(w).alias(f"__p_{out}")
             for out, src in prev_cols.items()]
    proj.append(F.row_number().over(w).alias("__rn"))
    b = b.select("*", *proj)

    first_struct = F.struct(*[F.col(src).alias(out)
                              for out, src in next_cols.items()]) \
        if next_cols else F.struct(F.lit(0).alias("__x"))
    last_struct = F.struct(*[F.col(src).alias(out)
                             for out, src in prev_cols.items()]) \
        if prev_cols else F.struct(F.lit(0).alias("__x"))
    summary = (bars
               .withColumn("__bkt", F.floor(F.col("bar_ts_us") / F.lit(bucket_us)))
               .groupBy("source", "__bkt")
               .agg(F.count(F.lit(1)).alias("__cnt"),
                    F.min_by(first_struct, "bar_ts_us").alias("__firstv"),
                    F.max_by(last_struct, "bar_ts_us").alias("__lastv")))
    # per-source windows over the SUMMARY table only: one row per
    # source-bucket (~1/1440th of the bars), a bounded sort even for a
    # pathological source
    wb = Window.partitionBy("source").orderBy("__bkt")
    summary = summary.select(
        "source", "__bkt", "__cnt",
        F.lead("__firstv").over(wb).alias("__nextb"),
        F.lag("__lastv").over(wb).alias("__prevb"),
        (F.sum("__cnt").over(wb) - F.col("__cnt")).alias("__offset"))

    b = b.join(summary, ["source", "__bkt"])
    for out in next_cols:
        b = b.withColumn(out, F.when(F.col("__rn") == F.col("__cnt"),
                                     F.col(f"__nextb.{out}"))
                         .otherwise(F.col(f"__n_{out}")))
    for out in prev_cols:
        b = b.withColumn(out, F.when(F.col("__rn") == 1,
                                     F.col(f"__prevb.{out}"))
                         .otherwise(F.col(f"__p_{out}")))
    if with_index:
        b = b.withColumn("bar_index",
                         (F.col("__offset") + F.col("__rn") - 1).cast("int"))
    drop = (["__bkt", "__rn", "__cnt", "__nextb", "__prevb", "__offset"]
            + [f"__n_{o}" for o in next_cols] + [f"__p_{o}" for o in prev_cols])
    return b.drop(*drop)


def with_tick_direction(ticks: DataFrame) -> DataFrame:
    """Adds prev-bid up/down flags. `seq` is the per-source arrival order; use
    `with_seq` first if the input does not carry one."""
    w = Window.partitionBy("source").orderBy("seq")
    prev = F.lag("bid").over(w)
    return (
        ticks
        .withColumn("up_tick", (prev.isNotNull() & (F.col("bid") > prev)).cast("int"))
        .withColumn("down_tick", (prev.isNotNull() & (F.col("bid") < prev)).cast("int"))
    )


def with_seq(ticks: DataFrame) -> DataFrame:
    w = Window.partitionBy("source").orderBy("ts")
    return ticks.withColumn("seq", F.row_number().over(w) - F.lit(1))


def _pair_dir(arr: str, field: str, op: str):
    """#consecutive pairs in a sorted struct array where cur.field <op>
    prev.field (JVM higher-order functions, no UDF)."""
    return F.expr(
        f"size(filter(zip_with(slice({arr}, 2, size({arr}) - 1), "
        f"slice({arr}, 1, size({arr}) - 1), (c, p) -> c.{field} {op} p.{field}), "
        "x -> x))").cast("long")


def aggregate_bars_partial(ticks: DataFrame, tf_minutes: int,
                           bucketed_order: bool = False,
                           burst_subbars: int | None = None) -> DataFrame:
    """ALL bars including the final not-yet-completed one, carrying
    spread_sum and first_ts_us so higher timeframes can be DERIVED from this
    output (bars_from_lower) instead of re-scanning + re-shuffling the full
    tick stream — the tick-sized pass happens once.

    Up/down tick direction is computed INSIDE the bar groupBy (sorted tick
    pairs per bar) plus a bar-level boundary term against the previous bar's
    close — semantically identical to a per-tick lag(bid) (the previous tick
    of a bar's first tick IS the previous bar's last tick), but it removes
    the tick-level window's partitionBy(source): a 10x-hot source no longer
    becomes one giant sort task, and the only tick-sized exchange left in
    the whole pipeline is this groupBy's partial-aggregated shuffle.
    (A pre-existing up_tick/down_tick from with_tick_direction is ignored.)

    HOT-BAR GUARD: the in-bar collect_list buffers ticks-per-bar structs in
    one aggregation buffer — bounded for minute bars on sane feeds (bench
    records max_ticks_per_bar), but a burst source cramming millions of
    ticks into ONE bar balloons it. burst_subbars=K switches to a TWO-LEVEL
    fold: ticks first aggregate into (bar, sub) groups of <=K ticks (buffer
    bounded by K), then the per-sub partials compose into the bar — in-sub
    directions sum, sub-boundary directions come from consecutive subs'
    first/last bids (one struct per sub, <=ticks/K of them). Bit-identical
    (tests/test_bars.py burst-bar test)."""
    tf_us = tf_minutes * US_PER_MIN
    # cast: accepts both session-tz TIMESTAMP and parquet TIMESTAMP_NTZ
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bar_ts = (us - (us % F.lit(tf_us))).alias("bar_ts_us")
    spread = F.col("ask") - F.col("bid")
    if burst_subbars:
        sub = (
            ticks
            .withColumn("bar_ts_us", bar_ts)
            .withColumn("__sub", F.floor(F.col("seq") / F.lit(burst_subbars)))
            .groupBy("source", "bar_ts_us", "__sub")
            .agg(
                F.min_by("bid", "seq").alias("open"),
                F.max("bid").alias("high"),
                F.min("bid").alias("low"),
                F.max_by("bid", "seq").alias("close"),
                F.count(F.lit(1)).alias("tick_volume"),
                F.sort_array(F.collect_list(F.struct("seq", "bid"))).alias("__tb"),
                F.sum(spread).alias("spread_sum"),
                F.max(spread).alias("max_spread"),
                F.min(spread).alias("min_spread"),
                F.min("seq").alias("first_seq"),
                F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("first_ts_us"),
            )
            .withColumn("__up_in", _pair_dir("__tb", "bid", ">"))
            .withColumn("__down_in", _pair_dir("__tb", "bid", "<"))
            .drop("__tb"))
        g = (
            sub.groupBy("source", "bar_ts_us")
            .agg(
                F.min_by("open", "first_seq").alias("open"),
                F.max("high").alias("high"),
                F.min("low").alias("low"),
                F.max_by("close", "first_seq").alias("close"),
                F.sum("tick_volume").alias("tick_volume"),
                # one small struct per sub: its first/last bid in seq order
                F.sort_array(F.collect_list(
                    F.struct("first_seq", "open", "close"))).alias("__sb"),
                F.sum("__up_in").alias("__up_sum"),
                F.sum("__down_in").alias("__down_sum"),
                F.sum("spread_sum").alias("spread_sum"),
                F.max("max_spread").alias("max_spread"),
                F.min("min_spread").alias("min_spread"),
                F.min("first_seq").alias("first_seq"),
                F.min("first_ts_us").alias("first_ts_us"),
            )
            # sub-boundary pairs: next sub's first bid vs this sub's last bid
            .withColumn("__up_in", F.col("__up_sum") + F.expr(
                "size(filter(zip_with(slice(__sb, 2, size(__sb) - 1), "
                "slice(__sb, 1, size(__sb) - 1), (c, p) -> c.open > p.close), "
                "x -> x))").cast("long"))
            .withColumn("__down_in", F.col("__down_sum") + F.expr(
                "size(filter(zip_with(slice(__sb, 2, size(__sb) - 1), "
                "slice(__sb, 1, size(__sb) - 1), (c, p) -> c.open < p.close), "
                "x -> x))").cast("long"))
            .drop("__sb", "__up_sum", "__down_sum"))
    else:
        g = (
            ticks
            .withColumn("bar_ts_us", bar_ts)
            .groupBy("source", "bar_ts_us")
            .agg(
                F.min_by("bid", "seq").alias("open"),
                F.max("bid").alias("high"),
                F.min("bid").alias("low"),
                F.max_by("bid", "seq").alias("close"),
                F.count(F.lit(1)).alias("tick_volume"),
                F.sort_array(F.collect_list(F.struct("seq", "bid"))).alias("__tb"),
                F.sum(spread).alias("spread_sum"),
                F.max(spread).alias("max_spread"),
                F.min(spread).alias("min_spread"),
                F.min("seq").alias("first_seq"),
                F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("first_ts_us"),
            )
            .withColumn("__up_in", _pair_dir("__tb", "bid", ">"))
            .withColumn("__down_in", _pair_dir("__tb", "bid", "<"))
            .drop("__tb"))
    # boundary: the bar's first tick vs the previous bar's close (the very
    # first tick of a source has no direction — the _lastBid == 0 guard).
    # bucketed_order replaces the per-source lag window with the bounded
    # bucket-window + boundary-patch form (with_ordered_neighbors).
    if bucketed_order:
        g = with_ordered_neighbors(g, prev_cols={"__prev_close": "close"})
        prev_close = F.col("__prev_close")
    else:
        w = Window.partitionBy("source").orderBy("bar_ts_us")
        prev_close = F.lag("close").over(w)
    b_up = F.when(prev_close.isNotNull() & (F.col("open") > prev_close),
                  F.lit(1)).otherwise(F.lit(0))
    b_down = F.when(prev_close.isNotNull() & (F.col("open") < prev_close),
                    F.lit(1)).otherwise(F.lit(0))
    return (g.withColumn("up", (F.col("__up_in") + b_up).cast("long"))
            .withColumn("down", (F.col("__down_in") + b_down).cast("long"))
            .drop("__up_in", "__down_in", "__prev_close"))


def bars_from_lower(partial: DataFrame, mult_minutes: int) -> DataFrame:
    """Higher-timeframe PARTIAL bars aggregated from lower-timeframe partial
    bars (e.g. M1 -> M5): exact for every field — the bucket's first/last
    tick are the first/last lower bar's, extrema and sums compose, and
    spread_sum re-aggregates losslessly. The tick stream is never touched."""
    tf_us = mult_minutes * US_PER_MIN
    bucket = (F.col("bar_ts_us") - (F.col("bar_ts_us") % F.lit(tf_us))).alias("bar_ts_us")
    return (
        partial
        .select(F.col("source"), bucket, "open", "high", "low", "close",
                "tick_volume", "up", "down", "spread_sum", "max_spread",
                "min_spread", "first_seq", "first_ts_us")
        .groupBy("source", "bar_ts_us")
        .agg(
            F.min_by("open", "first_seq").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "first_seq").alias("close"),
            F.sum("tick_volume").alias("tick_volume"),
            F.sum("up").alias("up"),
            F.sum("down").alias("down"),
            F.sum("spread_sum").alias("spread_sum"),
            F.max("max_spread").alias("max_spread"),
            F.min("min_spread").alias("min_spread"),
            F.min("first_seq").alias("first_seq"),
            F.min("first_ts_us").alias("first_ts_us"),
        )
    )


def finish_bars(partial: DataFrame, bucketed_order: bool = False) -> DataFrame:
    """Completion semantics over partial bars: a bar completes when a later
    bar's first tick exists (BarAggregator.cs:39-56), so the final partial
    bar per source is dropped; adds bar_index and the avg spread.

    bucketed_order=True computes the lead/row_number via the bounded
    bucket-window form (with_ordered_neighbors) — no per-source sort task."""
    if bucketed_order:
        b = with_ordered_neighbors(
            partial,
            next_cols={"completion_seq": "first_seq",
                       "completion_ts_us": "first_ts_us"},
            with_index=True)
        return (b.withColumn("avg_spread",
                             F.col("spread_sum") / F.col("tick_volume"))
                .filter(F.col("completion_seq").isNotNull())
                .drop("first_ts_us", "spread_sum"))
    w = Window.partitionBy("source").orderBy("bar_ts_us")
    return (
        partial
        .withColumn("avg_spread", F.col("spread_sum") / F.col("tick_volume"))
        .withColumn("completion_seq", F.lead("first_seq").over(w))
        .withColumn("completion_ts_us", F.lead("first_ts_us").over(w))
        .withColumn("bar_index", F.row_number().over(w) - F.lit(1))
        .filter(F.col("completion_seq").isNotNull())
        .drop("first_ts_us", "spread_sum")
    )


def aggregate_bars(ticks_dir: DataFrame, tf_minutes: int) -> DataFrame:
    """ticks_dir: output of with_tick_direction. Returns COMPLETED bars:
    (source, bar_ts_us, open, high, low, close, tick_volume, up, down,
     max_spread, min_spread, first_seq, avg_spread, completion_seq,
     completion_ts_us, bar_index)."""
    return finish_bars(aggregate_bars_partial(ticks_dir, tf_minutes))


def market_state(m5_bars: DataFrame, out_col: str = "market_state") -> DataFrame:
    """Market-state classifier (FeaturePipeline.cs:176-197) — the reference
    computes it per emission over the latest 20 M5 bars and never persists
    it; here it is an optional diagnostic column on the M5 bar stream (the
    state only changes when an M5 bar completes). Faithful quirks: fewer
    than 20 bars -> Normal, and the averages cover the 19 MOST RECENT bars
    (Take(19) on a most-recent-first list includes the current bar and
    excludes the oldest of the 20)."""
    w19 = Window.partitionBy("source").orderBy("bar_ts_us").rowsBetween(-18, 0)
    w20 = Window.partitionBy("source").orderBy("bar_ts_us").rowsBetween(-19, 0)
    rng = F.col("high") - F.col("low")
    n20 = F.count(F.lit(1)).over(w20)
    avg_vol = F.avg("tick_volume").over(w19)
    avg_rng = F.avg(rng).over(w19)
    cur_vol = F.col("tick_volume")
    state = (
        F.when(n20 < 20, F.lit("Normal"))
        .when((cur_vol > avg_vol * 2) | (rng > avg_rng * 2), F.lit("HighActivity"))
        .when((cur_vol < avg_vol * 0.5) & (rng < avg_rng * 0.5), F.lit("LowActivity"))
        .otherwise(F.lit("Normal")))
    return m5_bars.withColumn(out_col, state)


def build_bars(ticks: DataFrame, timeframes=(1, 5)) -> dict[int, DataFrame]:
    """All timeframes branch off ONE tick-sized pass: the finest timeframe's
    partial bars are aggregated once, coarser ones derive from them."""
    td = with_tick_direction(ticks)
    base_tf = min(timeframes)
    base = aggregate_bars_partial(td, base_tf)
    out = {}
    for tf in timeframes:
        if tf == base_tf:
            out[tf] = finish_bars(base)
        else:
            assert tf % base_tf == 0, (tf, base_tf)
            out[tf] = finish_bars(bars_from_lower(base, tf))
    return out
