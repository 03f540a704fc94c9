"""Large-scale training-data pipeline operators: deduplication, similarity
search, text analysis, multimodal plumbing. All hot paths are JVM-side
(built-in functions / higher-order array expressions); Python appears only in
the clearly-marked multimodal decode stubs (Arrow-batched mapInPandas)."""
