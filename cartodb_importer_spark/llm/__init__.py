"""LLM-data-pipeline operators (north star, BASELINE.json): deduplication,
similarity search, text analysis, multimodal column handling. All hot paths
are JVM-side built-ins; Python appears only in Arrow-batched pandas UDFs
(multimodal decode stubs)."""
