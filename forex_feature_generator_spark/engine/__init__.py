"""The Spark engine: DataFrame/window/Arrow-kernel re-expression of the
reference pipeline (SURVEY.md §7.1):

tick DataFrame → range-partition by source + secondary sort → tumbling-window
bar aggregation (M1/M5) → per-entity vectorized feature kernels (reversed-anchor
trailing windows + emission-state columns) → sorted-merge as-of join (M5→M1) →
forward-window label kernel → stats agg + broadcast normalization → partitioned
parquet with snapshot manifest.
"""
