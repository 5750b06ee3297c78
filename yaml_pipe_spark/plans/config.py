"""YAML pipeline spec loading + validation.

Reference (P1, utils/config.py:18-57 + utils/config_models.py:5-18): yaml
safe_load, pydantic shape validation of {source, chunker, embedder, sink},
each {type, config{}}; the optional `state_manager` key is accepted outside
the model (config.py:46 note in SURVEY §2.5). Divergence (deliberate): errors
raise ConfigError instead of sys.exit(1) — the caller decides the exit code,
and failures are never swallowed (the reference exits 0 on pipeline errors,
core/pipeline.py:124-127).
"""

from __future__ import annotations

from typing import Any, Optional

import yaml
from pydantic import BaseModel, Field, ValidationError


class ConfigError(Exception):
    pass


class ComponentSpec(BaseModel):
    type: str
    config: dict[str, Any] = Field(default_factory=dict)


class PipelineSpec(BaseModel):
    source: ComponentSpec
    chunker: ComponentSpec
    embedder: ComponentSpec
    sink: ComponentSpec
    state_manager: Optional[ComponentSpec] = None
    # Engine extension beyond the reference's fixed 4-stage spec: an optional
    # ordered list of document-level filters (dedup / quality / sampling)
    # applied between change detection and chunking.
    filters: list[ComponentSpec] = Field(default_factory=list)
    # Optional serving strategy (yaml_pipe_spark/retrievers.py): exact
    # (default) | ivfpq | bm25 | hybrid_rrf. When set, run_pipeline builds/
    # refreshes the persisted index after the sink write and `search`/`eval`
    # serve from it — the reference's build-once/query-many split
    # (core/pipeline.py:101-127 vs core/evaluation.py:44-64) made explicit.
    retriever: Optional[ComponentSpec] = None


def parse_config(text: str) -> PipelineSpec:
    try:
        raw = yaml.safe_load(text)
    except yaml.YAMLError as e:
        raise ConfigError(f"invalid YAML: {e}") from e
    if not isinstance(raw, dict) or not raw:
        raise ConfigError("empty or non-mapping pipeline config")
    try:
        return PipelineSpec(**raw)
    except ValidationError as e:
        raise ConfigError(f"invalid pipeline spec: {e}") from e


def load_config(path: str) -> PipelineSpec:
    try:
        with open(path, encoding="utf-8") as f:
            text = f.read()
    except OSError as e:
        raise ConfigError(f"cannot read config {path}: {e}") from e
    return parse_config(text)


DEFAULT_CONFIG_YAML = """\
source:
  type: local_files
  config:
    path: ./data
    glob_pattern: "**/*.txt"
chunker:
  type: recursive_character
  config:
    chunk_size: 200
    chunk_overlap: 40
embedder:
  type: hash
  config:
    dim: 16
sink:
  type: parquet
  config:
    path: ./yamlpipe_output
state_manager:
  type: parquet
  config:
    path: ./.yamlpipe_state
"""
