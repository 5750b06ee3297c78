"""Search surface (reference app.py Searcher + dashboard plumbing): temp
pipeline config -> run -> top-k search, through the app helpers and CLI."""

from __future__ import annotations

import json
import os


def _mkdocs(tmp_path):
    data = tmp_path / "docs"
    data.mkdir()
    (data / "alpha.txt").write_text("alpha alpha alpha unique text one")
    (data / "bravo.txt").write_text("bravo bravo bravo different words two")
    return str(data)


def test_app_upload_run_search_flow(spark, tmp_path):
    from yaml_pipe_spark.app import (
        create_temp_pipeline_config,
        run_and_index,
        search,
    )

    data = _mkdocs(tmp_path)
    cfg = create_temp_pipeline_config(
        {"type": "local_files", "config": {"path": data, "glob_pattern": "**/*.txt"}},
        workdir=str(tmp_path),
        dim=16,
    )
    spec, res = run_and_index(cfg)
    assert res.n_loaded == 2 and res.n_chunks >= 2

    # hash embedder: querying with the doc text itself must rank it first
    rows = search(spec, "alpha alpha alpha unique text one", k=3)
    assert rows[0].rank == 1
    assert "alpha.txt" in rows[0].source
    assert rows == sorted(rows, key=lambda r: r.rank)


def test_search_cli(spark, tmp_path, capsys):
    from yaml_pipe_spark import cli
    from yaml_pipe_spark.app import create_temp_pipeline_config

    data = _mkdocs(tmp_path)
    cfg = create_temp_pipeline_config(
        {"type": "local_files", "config": {"path": data, "glob_pattern": "**/*.txt"}},
        workdir=str(tmp_path),
        dim=16,
    )
    assert cli.main(["run", "-c", cfg]) == 0
    capsys.readouterr()
    assert (
        cli.main(["search", "bravo bravo bravo different words two", "-c", cfg, "-k", "2"])
        == 0
    )
    out = json.loads(capsys.readouterr().out)
    assert len(out) == 2
    assert out[0]["rank"] == 1 and "bravo.txt" in out[0]["source"]


def test_eval_cli_empty_dataset_matches_reference(spark, tmp_path, capsys):
    # reference evaluation.py:97-99: empty dataset -> hit_rate 0.0, not null
    from yaml_pipe_spark import cli
    from yaml_pipe_spark.app import create_temp_pipeline_config

    data = _mkdocs(tmp_path)
    cfg = create_temp_pipeline_config(
        {"type": "local_files", "config": {"path": data, "glob_pattern": "**/*.txt"}},
        workdir=str(tmp_path),
        dim=16,
    )
    assert cli.main(["run", "-c", cfg]) == 0
    capsys.readouterr()
    ds = os.path.join(str(tmp_path), "empty.jsonl")
    open(ds, "w").close()
    assert cli.main(["eval", ds, "-c", cfg]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out == {"hit_rate": 0.0, "total_questions": 0, "hits": 0}


def test_dashboard_ui_is_import_gated():
    import pytest

    from yaml_pipe_spark import app

    with pytest.raises(SystemExit, match="streamlit"):
        app.main()


class _FakeContainer:
    def __init__(self):
        self.lines: list[str] = []

    def text(self, s: str) -> None:
        self.lines.append(s)


def test_live_log_handler_streams_and_detaches():
    """The dashboard's live-log seam (reference StreamlitLogHandler,
    app.py:18-26 + 148-149): records emitted inside the block reach the
    container formatted; the handler is removed on exit (the reference
    leaks it, double-logging every rerun) — including on failure."""
    import logging

    from yaml_pipe_spark.app import ContainerLogHandler, attach_live_logs

    box = _FakeContainer()
    # deliberately NO setLevel on this logger: it must inherit the level
    # attach_live_logs sets on the root for the block (the default root
    # WARNING level would short-circuit INFO records before any handler)
    log = logging.getLogger("yaml_pipe_spark.test_live")
    root_level_before = logging.getLogger().level
    with attach_live_logs(box) as handler:
        assert isinstance(handler, ContainerLogHandler)
        log.info("chunking %d docs", 4)
    assert any("chunking 4 docs" in line and "INFO" in line for line in box.lines)
    assert logging.getLogger().level == root_level_before  # restored
    n = len(box.lines)
    log.info("after the block")  # handler detached: nothing new arrives
    assert len(box.lines) == n

    # failure path: the handler must still detach
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        with attach_live_logs(box):
            raise RuntimeError("boom")
    log.info("after the failure")
    assert len(box.lines) == n


def test_live_log_handler_survives_broken_container():
    """A UI container that throws must not kill the logging call (the
    handler routes through handleError instead of raising)."""
    import logging

    from yaml_pipe_spark.app import attach_live_logs

    class Broken:
        def text(self, s):
            raise IOError("container gone")

    log = logging.getLogger("yaml_pipe_spark.test_live2")
    with attach_live_logs(Broken()):
        log.warning("this must not raise")
