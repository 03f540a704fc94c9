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
                   source_name: str = "default") -> DataFrame:
    """(source, ts, bid, ask) with reference drop semantics; lazy —
    no job runs here."""
    raw = _raw(spark, path)
    return (raw.filter(_ok(raw) & ~_blank(raw))
            .drop("_corrupt")
            .withColumn("source", F.lit(source_name)))


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
