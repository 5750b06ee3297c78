"""Interactive dashboard (reference app.py:96-196): pick a source (uploaded
files or a URL), run a temp pipeline, then live top-3 search over the result.

Streamlit is not installed in this container, so the UI layer is
import-gated; everything below the UI — temp-config creation, the pipeline
run, the search — is plain functions shared with the CLI (`search` command)
and covered by tests/test_search_app.py. Launch with:

    streamlit run yaml_pipe_spark/app.py
"""

from __future__ import annotations

import contextlib
import logging
import os
import tempfile

import yaml


class ContainerLogHandler(logging.Handler):
    """Reference StreamlitLogHandler (app.py:18-26): mirror log records
    into a UI container as they are emitted. Framework-agnostic on
    purpose — anything with a `.text(str)` method works (a Streamlit
    container, or the fake used in tests, since streamlit is absent in
    this environment)."""

    def __init__(self, container):
        super().__init__()
        self.container = container

    def emit(self, record: logging.LogRecord) -> None:
        try:
            self.container.text(self.format(record))
        except Exception:  # a broken UI container must never kill the run
            self.handleError(record)


@contextlib.contextmanager
def attach_live_logs(container, level: int = logging.INFO, fmt: str = "%(asctime)s - %(levelname)s - %(message)s"):
    """Stream root-logger records into `container` for the duration of a
    block (the reference attaches its handler for the pipeline run,
    app.py:148-149 — but never detaches it, so every rerun double-logs;
    this seam removes the handler on exit, success or failure)."""
    handler = ContainerLogHandler(container)
    handler.setLevel(level)
    handler.setFormatter(logging.Formatter(fmt))
    root = logging.getLogger()
    # loggers short-circuit below the root's EFFECTIVE level before any
    # handler is consulted — with the default root level (WARNING), INFO
    # progress records would never reach the container; lower it for the
    # block and restore after
    prior_level = root.level
    if root.getEffectiveLevel() > level:
        root.setLevel(level)
    root.addHandler(handler)
    try:
        yield handler
    finally:
        root.removeHandler(handler)
        root.setLevel(prior_level)


def create_temp_pipeline_config(
    source_config: dict, workdir: str | None = None, dim: int = 64
) -> str:
    """Reference create_temp_pipeline_config (app.py:64-93): wrap a source
    block in a full pipeline spec writing to a temp sink."""
    workdir = workdir or tempfile.mkdtemp(prefix="yaml_pipe_ui_")
    spec = {
        "source": source_config,
        "chunker": {
            "type": "fixed_window",
            "config": {"chunk_size": 500, "chunk_overlap": 50},
        },
        "embedder": {"type": "hash", "config": {"dim": dim}},
        "sink": {
            "type": "parquet",
            "config": {"path": os.path.join(workdir, "ui_sink")},
        },
    }
    path = os.path.join(workdir, "pipeline.yaml")
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(spec, f)
    return path


def run_and_index(config_path: str):
    """Run the temp pipeline; returns (spec, PipelineResult)."""
    from yaml_pipe_spark.plans.config import load_config
    from yaml_pipe_spark.plans.pipeline import run_pipeline
    from yaml_pipe_spark.session import get_spark

    spec = load_config(config_path)
    res = run_pipeline(get_spark("yaml-pipe-spark-ui"), spec)
    return spec, res


def search(spec, query: str, k: int = 3):
    """Top-k rows (rank, source, text, score) for the query."""
    from yaml_pipe_spark.search import search_corpus
    from yaml_pipe_spark.session import get_spark

    return search_corpus(get_spark("yaml-pipe-spark-ui"), spec, query, k=k).collect()


def main() -> None:  # pragma: no cover - needs streamlit
    try:
        import streamlit as st
    except ImportError as exc:  # the gated UI layer
        raise SystemExit(
            "streamlit is not installed; the dashboard UI needs it "
            "(`pip install streamlit`). The same functionality is available "
            "via the CLI: yaml-pipe-spark run/search."
        ) from exc

    st.set_page_config(page_title="yaml-pipe-spark", layout="wide")
    st.title("yaml-pipe-spark: pipeline dashboard")

    st.header("1. Select data source")
    source_type = st.radio(
        "Source type", ("Local file upload", "Website URL"), horizontal=True
    )
    source_config = None
    if source_type == "Local file upload":
        uploaded = st.file_uploader("Upload documents", accept_multiple_files=True)
        if uploaded:
            updir = os.path.join("temp_ui", "uploads")
            os.makedirs(updir, exist_ok=True)
            for uf in uploaded:
                with open(os.path.join(updir, uf.name), "wb") as f:
                    f.write(uf.getbuffer())
            source_config = {
                "type": "local_files",
                "config": {"path": updir, "glob_pattern": "**/*", "parse": True},
            }
    else:
        url = st.text_input("Website URL", "https://example.com")
        if url:
            source_config = {"type": "web", "config": {"url": url}}

    st.header("2. Run pipeline")
    if source_config and st.button("Run pipeline"):
        cfg = create_temp_pipeline_config(source_config)
        with st.spinner("Pipeline running..."):
            log_box = st.expander("View real-time logs", expanded=True)
            try:
                with attach_live_logs(log_box):
                    spec, res = run_and_index(cfg)
                st.success(
                    f"Pipeline done: {res.n_loaded} docs -> {res.n_chunks} chunks"
                )
                st.session_state["spec"] = spec
            except Exception as e:  # surface, don't swallow
                st.error(f"Pipeline failed: {e}")

    st.header("3. Search test")
    if "spec" in st.session_state:
        query = st.text_input("Ask a question:")
        if query:
            rows = search(st.session_state["spec"], query, k=3)
            st.subheader("Top 3 results")
            for r in rows:
                st.markdown(f"**{r.rank}. Source: `{r.source}`** (score {r.score})")
                st.info(r.text)
    else:
        st.warning("Run a pipeline first.")


if __name__ == "__main__":
    main()
