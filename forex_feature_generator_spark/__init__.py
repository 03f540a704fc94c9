"""forex_feature_generator_spark — a from-scratch PySpark-native point-in-time
feature-engineering engine with the capabilities of lvvdat/forex_feature_generator.

Reference semantics: /root/reference (C#/.NET). This package is NOT a port: the
reference's single-threaded per-tick loop is re-expressed as DataFrame window
aggregations, sorted-merge as-of joins, and vectorized Arrow kernels
(applyInPandas / cogroup.applyInPandas). See SURVEY.md for the full mapping.

Layout:
  oracle/  — line-faithful pure-Python transcription of the reference
             (golden-fixture generator; the correctness oracle for tests)
  engine/  — the Spark engine: bars, feature kernels, as-of join, labels,
             stats/normalization, tokens-table pipeline, skew/salting,
             snapshot checkpoint/resume
  ops/     — large-scale pipeline operators (dedup, similarity search,
             text analysis, multimodal plumbing)
  synth.py — deterministic synthetic data generators (seed=42)
"""

__version__ = "0.1.0"
