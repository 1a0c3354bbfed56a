#!/usr/bin/env python
"""Measured baseline: run the bench queries' oracle SQL on DuckDB (the
reference's engine, here the native Python build rather than WASM) at the
same scale factor and thread count as bench.py.

Prints ONE JSON line mirroring bench.py's shape so the two are directly
comparable:
  {"metric": "baseline_duckdb_total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Queries without a SQL oracle (engine-specific sketches) are skipped and
listed under "skipped".
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
THREADS = os.environ.get("SPARK_GRAFT_CPUS", "32")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    import duckdb

    from parquet_query_spark.operators.catalog import load_all

    catalog = load_all()
    bench = [(n, s) for n, s in catalog.items() if "bench" in s.tags]

    con = duckdb.connect()
    con.execute(f"SET threads TO {THREADS}")
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    # steady-state: one unmeasured warm pass (same protocol as bench.py)
    for _, spec in bench:
        if spec.oracle:
            con.execute(spec.oracle).fetchall()

    # two measured passes, per-query MIN (same noise-robust protocol as
    # bench.py)
    timings: dict[str, float] = {}
    skipped: list[str] = []
    for _ in range(2):
        for name, spec in bench:
            if not spec.oracle:
                if name not in skipped:
                    skipped.append(name)
                continue
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            elapsed = round(time.perf_counter() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    print(
        json.dumps(
            {
                "metric": "baseline_duckdb_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "skipped": skipped,
                "sf": float(m.group(1)) if m else None,
            }
        )
    )


if __name__ == "__main__":
    main()
