"""Z-order layout: real parquet row-group pruning measured with pyarrow.

The registered query (layout_zorder_locality) models file-level min/max
pruning relationally; this test writes ACTUAL parquet under the three write
orders and reads the footer statistics back — the exact stats a manifest
(Delta/Iceberg) or Spark's row-group filter would prune with — asserting
z-order dominates on a 2-D box and still prunes on the NON-leading
dimension, where a lexicographic sort goes fully blind.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

N = 4096
FILES = 16


def _zval(d1: str, d2: str):
    terms = []
    for i in range(8):
        terms.append(
            F.shiftleft(
                F.shiftright(F.col(d1), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
        terms.append(
            F.shiftleft(
                F.shiftright(F.col(d2), i).bitwiseAND(F.lit(1)), 2 * i
            )
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """Write the same 4096 rows under natural / linear / z-order, 16 files
    each (one row group per file), and return {layout: dir}."""
    base = tmp_path_factory.mktemp("layouts")
    df = (
        spark.range(N)
        .select(
            F.col("id"),
            ((F.col("id") * 37) % 256).alias("d1"),
            ((F.col("id") * 101) % 256).alias("d2"),
        )
        .withColumn("z", _zval("d1", "d2"))
    )
    orders = {
        "natural": [F.col("id")],
        "linear": [F.col("d1"), F.col("d2"), F.col("id")],
        "zorder": [F.col("z"), F.col("id")],
    }
    dirs = {}
    for name, cols in orders.items():
        out = str(base / name)
        (
            df.repartition(1)
            .sortWithinPartitions(*cols)
            .write.option("maxRecordsPerFile", N // FILES)
            .parquet(out)
        )
        dirs[name] = out
    return dirs


def _files_scanned(path: str, box1: tuple | None, box2: tuple | None) -> int:
    """Count parquet files whose d1/d2 footer min-max overlap the box —
    the manifest-pruning decision, taken from the real statistics."""
    scanned, total = 0, 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        keep = True
        for col, box in (("d1", box1), ("d2", box2)):
            if box is None:
                continue
            st = md.row_group(0).column(names.index(col)).statistics
            assert st is not None and st.has_min_max
            if st.max < box[0] or st.min > box[1]:
                keep = False
        total += 1
        scanned += keep
    assert total == FILES, f"{path}: expected {FILES} files, saw {total}"
    return scanned


def test_box_query_pruning(layouts):
    """Aligned 32x32 box: z-order confines it to <=2 row groups; natural
    order (hash-scattered dims) cannot prune at all."""
    box = (96, 127)
    nat = _files_scanned(layouts["natural"], box, box)
    lin = _files_scanned(layouts["linear"], box, box)
    zo = _files_scanned(layouts["zorder"], box, box)
    assert nat == FILES  # every file spans the whole space
    assert zo <= lin
    assert zo <= 2  # the box is an aligned quadtree cell: 1/64 of z-range


def test_non_leading_dim_pruning(layouts):
    """d2-only slice: lexicographic files all span full d2 (blind), while
    z-order still skips most row groups — the reason to interleave."""
    box2 = (96, 127)
    nat = _files_scanned(layouts["natural"], None, box2)
    lin = _files_scanned(layouts["linear"], None, box2)
    zo = _files_scanned(layouts["zorder"], None, box2)
    assert nat == FILES and lin == FILES
    assert zo < FILES // 2  # the 1/8 slice splinters into short z-runs


def test_pruning_is_lossless(spark, layouts):
    """Scanning only the overlapping files returns exactly the box rows."""
    box = (96, 127)
    full = (
        spark.read.parquet(layouts["zorder"])
        .filter(F.col("d1").between(*box) & F.col("d2").between(*box))
        .count()
    )
    kept = [
        f
        for f in sorted(
            glob.glob(os.path.join(layouts["zorder"], "*.parquet"))
        )
        if _overlaps(f, box)
    ]
    pruned = (
        spark.read.parquet(*kept)
        .filter(F.col("d1").between(*box) & F.col("d2").between(*box))
        .count()
    )
    assert pruned == full > 0


def _overlaps(f: str, box: tuple) -> bool:
    md = pq.ParquetFile(f).metadata
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    for col in ("d1", "d2"):
        st = md.row_group(0).column(names.index(col)).statistics
        if st.max < box[0] or st.min > box[1]:
            return False
    return True
