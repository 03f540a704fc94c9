"""CSV tick source — Spark re-expression of Pipeline/TickLoader.cs:30-115.

Reference semantics reproduced JVM-side (no Python per line):
  * header line dropped (cs:37-41)
  * blank lines and lines starting with '#' skipped silently (cs:48-50)
  * Timestamp,Bid,Ask parsed with per-field trim (cs:92-115 TryParseTick);
    any unparseable line is DROPPED and counted — the reference warns per
    line (cs:63), we surface one aggregate diagnostics dict instead (a 100 TB
    scan cannot afford a driver-side warning per bad row).

The PERMISSIVE corrupt-record column keeps the scan single-pass: good rows
and the malformed count come from the same read."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TICK_CSV_SCHEMA = "ts timestamp, bid double, ask double, _corrupt string"


def _raw(spark: SparkSession, path: str) -> DataFrame:
    return (spark.read
            .option("header", True)
            .option("comment", "#")
            .option("ignoreLeadingWhiteSpace", True)
            .option("ignoreTrailingWhiteSpace", True)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .schema(TICK_CSV_SCHEMA)
            .csv(path))


def _ok(df: DataFrame):
    # TryParseTick requires all three fields to parse (cs:101-113); a
    # whitespace-only line is a silent skip, not a malformed row (cs:48-50)
    return (F.col("ts").isNotNull() & F.col("bid").isNotNull()
            & F.col("ask").isNotNull())


def _blank(df: DataFrame):
    return (F.col("_corrupt").isNotNull()
            & (F.trim(F.col("_corrupt")) == F.lit("")))


def load_ticks_csv(spark: SparkSession, path: str,
                   source_name: str = "default",
                   seq_mode: str = "window") -> DataFrame:
    """(source, ts, bid, ask, seq) with reference drop semantics.

    `seq` is the FILE/ARRIVAL order as a DENSE 0-based per-source position:
    monotonically_increasing_id gives the arrival ORDER (split index in the
    high bits, in-split row offset in the low bits — CSV splits are assigned
    in file-offset order, so it is order-consistent with the file), but its
    raw values have ~2^33 gaps between splits whenever Spark reads the input
    as more than one partition (file > maxPartitionBytes, or a multi-file
    directory). The label kernel indexes tick arrays POSITIONALLY by seq
    (labels.py), so we densify to match the reference's sequential read
    (TickLoader.cs:30-69); seq also feeds validate_ticks' ordering check
    and the bar aggregation's arrival-order semantics without a ts sort.

    TWO densify modes (round-4 review):

    * "window" (default; LAZY — no job runs here): row_number over the
      arrival order. `source` is a single literal per load, so the window
      is ONE partition = ONE sort task — the whole file funnels through it.
      Fine for the reference's per-pair files (tens of MB); the documented
      WRONG choice for a multi-GB single-source file.
    * "split-offsets" (scale path; runs ONE eager job): per-split row
      counts -> gap-free cumulative offsets (bounded collect, one row per
      input split) -> seq = offset[split] + in-split position, map-side,
      NO shuffle and NO sort anywhere. Identical seq values (tests assert
      window ≡ split-offsets on a multi-split read); costs one extra scan
      of the file, which is parallel — unlike the single-task sort."""
    raw = _raw(spark, path)
    good = (raw.filter(_ok(raw) & ~_blank(raw))
            .drop("_corrupt")
            .withColumn("source", F.lit(source_name))
            .withColumn("__arrival", F.monotonically_increasing_id()))
    # seq is LONG in both modes: split-offsets is the multi-GB single-file
    # scale path where >2^31-1 tick rows (~50 GB of ~25-byte rows) is
    # reachable — an int cast would overflow silently there (round-5
    # advice); window mode matches so the two modes stay schema-identical
    # (tests assert mode parity on the same file).
    if seq_mode == "window":
        from pyspark.sql import Window
        w = Window.partitionBy("source").orderBy("__arrival")
        return (good.withColumn("seq", (F.row_number().over(w) - F.lit(1))
                                .cast("long"))
                .drop("__arrival"))
    if seq_mode != "split-offsets":
        raise ValueError(f"seq_mode must be 'window' or 'split-offsets', "
                         f"got {seq_mode!r}")
    # monotonically_increasing_id = (split << 33) | in-split offset, with
    # the offset DENSE per split because the id is assigned AFTER the
    # malformed-row filter. One count-by-split job (S rows, S = number of
    # input splits), then offsets rejoin via broadcast.
    split = F.shiftrightunsigned(F.col("__arrival"), 33)
    local = F.col("__arrival").bitwiseAND(F.lit((1 << 33) - 1))
    counts = (good.groupBy(split.alias("__split"))
              .agg(F.count(F.lit(1)).alias("__n"))
              .orderBy("__split").collect())
    off, offsets = 0, []
    for r in counts:
        offsets.append((r["__split"], off))
        off += r["__n"]
    off_df = spark.createDataFrame(offsets, "__split long, __off long")
    return (good.withColumn("__split", split)
            .join(F.broadcast(off_df), "__split")
            .withColumn("seq", (F.col("__off") + local).cast("long"))
            .drop("__arrival", "__split", "__off"))


def validate_ticks(ticks: DataFrame) -> dict:
    """Tick-quality scan (Program.cs:135-177 ValidateTickData): spread
    statistics in pips, the extreme-spread warning (max > 10x avg), and the
    time-ordering-violation count — one aggregation pass instead of the
    reference's driver-side loops.

    The ordering check needs an ARRIVAL-order column (`seq` — file/row order,
    the reference detects ts going backwards in file order). Ordering the
    window by `ts` itself would make lag(ts) > ts vacuously false, so when no
    `seq` exists the check is SKIPPED with an explicit issue note and
    ts_violations is None (load_ticks_csv always supplies seq)."""
    from pyspark.sql import Window
    spread = F.col("ask") - F.col("bid")
    has_order = "seq" in ticks.columns
    issues = []
    if has_order:
        w = Window.partitionBy("source").orderBy("seq")
        viol = (F.lag("ts").over(w) > F.col("ts")).cast("int")
        ticks = ticks.withColumn("__viol", viol)
        viol_agg = F.coalesce(F.sum("__viol"), F.lit(0)).alias("viol")
    else:
        viol_agg = F.lit(None).cast("long").alias("viol")
        issues.append("Ordering check skipped: no arrival-order 'seq' column "
                      "(ordering by ts would be vacuous)")
    row = (ticks
           .agg(F.avg(spread).alias("avg_s"), F.min(spread).alias("min_s"),
                F.max(spread).alias("max_s"), F.count(F.lit(1)).alias("n"),
                viol_agg)
           .first())
    if row["max_s"] is not None and row["max_s"] > row["avg_s"] * 10:
        issues.append(f"Extreme spread detected: {row['max_s'] * 10000:.2f} pips")
    if row["viol"]:
        issues.append(f"Time ordering issues: {row['viol']} rows")
    return {
        "n_ticks": row["n"],
        "avg_spread_pips": round(row["avg_s"] * 10000, 2) if row["avg_s"] is not None else None,
        "min_spread_pips": round(row["min_s"] * 10000, 2) if row["min_s"] is not None else None,
        "max_spread_pips": round(row["max_s"] * 10000, 2) if row["max_s"] is not None else None,
        "ts_violations": int(row["viol"]) if row["viol"] is not None else None,
        "issues": issues,
    }


def csv_diagnostics(spark: SparkSession, path: str) -> dict:
    """One aggregate pass over the same scan: data lines seen (excluding
    header/comments/blank), ticks kept, malformed dropped — the aggregate
    form of TickLoader's per-line '⚠️ Error parsing line N' warnings."""
    raw = _raw(spark, path)
    row = (raw.filter(~_blank(raw))
           .agg(F.count(F.lit(1)).alias("lines"),
                F.count(F.when(_ok(raw), 1)).alias("ticks"))
           .first())
    return {"lines": row["lines"], "ticks": row["ticks"],
            "malformed": row["lines"] - row["ticks"]}
