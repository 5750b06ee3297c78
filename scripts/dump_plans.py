#!/usr/bin/env python
"""Dump `.explain("formatted")` for queries to plans/<dir>/<name>_<tag>.txt:
`python scripts/dump_plans.py --dir r14 --tag before NAME [NAME ...]`.
The query function runs first (some rows execute eagerly), then the
RETURNED frame's formatted plan is written."""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--dir", default="r14")
    ap.add_argument("--tag", default="after")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    args = ap.parse_args()

    from yaml_pipe_spark.entrypoints import REGISTRY
    from yaml_pipe_spark.session import get_spark

    spark = get_spark("dump-plans", cpus=args.cpus)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", args.dir)
    os.makedirs(out_dir, exist_ok=True)
    for name in args.names:
        df = REGISTRY[name].fn(spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
