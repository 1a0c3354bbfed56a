#!/usr/bin/env python
"""Capture .explain('formatted') for every bench-tagged query.

Usage: python plans/r13/capture_plans.py <suffix> [names...]
Writes plans/r13/<query>_<suffix>.txt for each bench query (or the
named subset).
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    from parquet_query_spark.operators.catalog import load_all
    from parquet_query_spark.session import get_spark

    spark = get_spark("plan-capture")
    catalog = load_all()
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name, spec in catalog.items():
        if "bench" not in spec.tags:
            continue
        if only and name not in only:
            continue
        df = spec.fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
