"""Q2 eval through the CLI surface: pipeline run -> JSONL questions ->
hit-rate (reference cli.py:198-213 + evaluation.py:66-109)."""

from __future__ import annotations

import json
import os
import tempfile


def test_eval_cli(spark, capsys):
    from yaml_pipe_spark import cli

    with tempfile.TemporaryDirectory() as tmp:
        data = os.path.join(tmp, "data")
        os.makedirs(data)
        # two distinguishable docs; hash embedder is deterministic, so a
        # question that IS the doc text embeds identically -> guaranteed hit
        doc_a = "alpha alpha alpha unique text one"
        doc_b = "bravo bravo bravo different words two"
        for name, text in [("a.txt", doc_a), ("b.txt", doc_b)]:
            with open(os.path.join(data, name), "w") as f:
                f.write(text)
        cfg = os.path.join(tmp, "p.yaml")
        with open(cfg, "w") as f:
            f.write(
                f"""
source:
  type: local_files
  config: {{path: "{data}", glob_pattern: "**/*.txt"}}
chunker:
  type: fixed_window
  config: {{chunk_size: 100, chunk_overlap: 0}}
embedder:
  type: hash
  config: {{dim: 8}}
sink:
  type: parquet
  config: {{path: "{tmp}/out"}}
"""
            )
        assert cli.main(["run", "-c", cfg]) == 0
        capsys.readouterr()

        ds = os.path.join(tmp, "eval.jsonl")
        with open(ds, "w") as f:
            for text, name in [(doc_a, "a.txt"), (doc_b, "b.txt")]:
                f.write(
                    json.dumps(
                        {
                            "question": text,
                            "expected_source": f"file:{data}/{name}",
                        }
                    )
                    + "\n"
                )
        assert cli.main(["eval", ds, "-c", cfg, "-k", "1"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["hit_rate"] == 100.0 and out["hits"] == 2


def test_audit_cli(spark, capsys):
    import json as _json

    from tests.conftest import SF_SMALL
    from yaml_pipe_spark import cli

    rc = cli.main(
        ["audit", "--only", "quality_funnel,partition_skew,zipf", "-d", SF_SMALL]
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0 and len(out) == 3
    payloads = [_json.loads(line) for line in out]
    assert [p["audit"] for p in payloads] == [
        "quality_funnel", "partition_skew", "zipf",
    ]
    funnel = payloads[0]["rows"]
    assert funnel[0]["stage"] == "raw" and funnel[0]["retention"] == 1.0
    assert all(p["rows"] for p in payloads)

    # unknown audit key is an honest non-zero with the available list
    assert cli.main(["audit", "--only", "nope", "-d", SF_SMALL]) == 1
    assert "available:" in capsys.readouterr().err
