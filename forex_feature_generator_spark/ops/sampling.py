"""Deterministic sampling / splitting for training-data pipelines.

Everything is a pure function of (seed, id): no RNG state, no shuffle, no
driver round-trip — re-running on new data keeps old assignments stable
(the property a 100 TB incremental pipeline needs), and every operator is
DuckDB-oracle checkable via the shared md5-prefix hash (ops/dedup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 1_000_000


def _unit_hash(id_col, seed: int):
    """Deterministic uniform int in [0, HASH_BUCKETS): md5 prefix of
    'seed:id' — identical in Spark (conv) and DuckDB (strpos arithmetic)."""
    key = F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    return (F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
            % F.lit(HASH_BUCKETS))


def hash_split(df: DataFrame, id_col: str = "doc_id",
               weights: dict[str, float] | None = None,
               seed: int = 42, out_col: str = "split") -> DataFrame:
    """Stable train/val/test assignment by hashed id: row -> the split whose
    cumulative weight interval contains hash(id)/BUCKETS. Adding new rows
    never reassigns old ones."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    h = _unit_hash(id_col, seed)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = h < int(acc * HASH_BUCKETS)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def deterministic_sample(df: DataFrame, fraction: float,
                         id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Bernoulli-by-hash sample: keeps rows with hash(id) < fraction*BUCKETS.
    Exact reproducibility; supersets nest (fraction 0.1 ⊂ fraction 0.2)."""
    return df.filter(_unit_hash(id_col, seed) < int(fraction * HASH_BUCKETS))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict[str, float],
                      id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Per-stratum deterministic sampling rates (e.g. downsample dominant
    languages). Strata missing from `fractions` are dropped (rate 0) —
    matching Spark's sampleBy contract but reproducible by hash."""
    h = _unit_hash(id_col, seed)
    expr = F.lit(False)
    for value, frac in fractions.items():
        expr = expr | ((F.col(strata_col) == F.lit(value))
                       & (h < int(frac * HASH_BUCKETS)))
    return df.filter(expr)


def sql_unit_hash(id_expr: str, seed: int, hex2int_15: str) -> str:
    """DuckDB mirror of _unit_hash for oracle construction; hex2int_15 is the
    caller's 15-hex-char conversion of md5('seed:' || id)."""
    return f"({hex2int_15} % {HASH_BUCKETS})"
