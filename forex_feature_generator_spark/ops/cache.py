"""Persisted-intermediate registry for the ops library.

Several ops persist a shared intermediate because the returned lazy plan
references it from more than one branch (without the cache the upstream
subplan evaluates once per branch — measured 2-4 full duplicate evaluations
at the 10x probe, BENCH/sf1_results.json). The persist itself is correct;
what Spark lacks is a scope-exit hook on DataFrames, so in a long-lived
session composing many ops (bench runs all ~50 queries x 4 executions in
ONE SparkSession) those caches accumulate until executor-storage LRU
pressure distorts later queries (round-5 review).

Contract: ops register every persisted intermediate via `pin()`; the
CALLER releases them with `release_all()` after the consuming action
(count/collect/write) materializes the op's output. Releasing before the
action would defeat the persist; releasing is idempotent and tolerates
already-unpersisted frames. One-shot drivers that stop the session right
after a query may skip the call — session teardown frees everything.

Not covered: `localCheckpoint` RDDs (dedup_clusters' iterative loop) —
the returned DataFrame's lineage is rooted at the final checkpoint, so it
cannot be released while the result is still referenced; those are
per-call bounded (one small labels table per converged run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """persist() + register for later release_all(). Returns the same df."""
    df = df.persist()
    _PINNED.append(df)
    return df


def pinned_count() -> int:
    return len(_PINNED)


def release_all(blocking: bool = False) -> int:
    """Unpersist every registered intermediate; returns how many released.
    Safe to call at any time (frames from stopped sessions are skipped)."""
    n = 0
    while _PINNED:
        df = _PINNED.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass
    return n
