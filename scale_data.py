#!/usr/bin/env python
"""Generate an N× scaled copy of a testdata directory for scale-headroom
checks (the BASELINE.md "8×" experiment).

Big tables are unioned N times with key offsets (so keys stay unique);
dimension tables are copied as-is.  DuckDB does the heavy lifting — no
Spark session needed.

Usage:
  python scale_data.py [--src /root/testdata/sf0.1] [--dst /tmp/scale_x8] [--factor 8]
  SPARK_GRAFT_SF_DIR=/tmp/scale_x8 python bench.py
  SPARK_GRAFT_SF_DIR=/tmp/scale_x8 python baseline_duckdb.py
"""

from __future__ import annotations

import argparse
import os

DIMS = ["region", "nation", "customer", "supplier", "part"]
FACTS = {
    "lineitem": ("l_orderkey", 10_000_000),
    "orders": ("o_orderkey", 10_000_000),
    "documents": ("doc_id", 1_000_000),
    "embeddings": ("vec_id", 1_000_000),
    "events": ("event_id", 10_000_000),
}


def main() -> None:
    import duckdb

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/scale_x8")
    ap.add_argument("--factor", type=int, default=8)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{args.src}/{t}.parquet') "
            f"TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")
    for t, (key, off) in FACTS.items():
        union = " UNION ALL ".join(
            f"SELECT * REPLACE ({key} + {i * off} AS {key}) "
            f"FROM '{args.src}/{t}.parquet'"
            for i in range(args.factor)
        )
        con.execute(f"COPY ({union}) TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{args.dst}/{t}.parquet'").fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
