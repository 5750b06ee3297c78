"""yaml_pipe_spark — a PySpark-native, config-driven document dataflow engine.

Re-expresses the capabilities of the reference RAG-ingestion engine
(dongwonmoon/Yaml-Pipe: YAML-configured source -> chunker -> embedder -> sink
pipelines plus a top-k vector-search query path) as idiomatic Spark DataFrame
operators, and extends the surface with the LLM-data-pipeline operators a
100 TB training-data pipeline needs: exact & near-dup deduplication, similarity
search/join, text analysis, and multimodal column plumbing.

Design stance (SURVEY.md §7):
- Core = pure DataFrame -> DataFrame operator functions, each independently
  checkable against a DuckDB oracle.
- Shell = a Yaml-Pipe-compatible layer (pydantic spec, registries, CLI) that
  composes core operators into one lazy plan executed by a single write.
- No custom Catalyst rules: every operator is a narrow transform or a single
  declared shuffle, so Catalyst/AQE keep optimizing at scale.
"""

__version__ = "0.1.0"
