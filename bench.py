#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "bench_total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from parquet_query_spark.operators.catalog import load_all
    from parquet_query_spark.session import get_spark

    spark = get_spark("parquet_query_spark-bench")
    catalog = load_all()
    bench_names = [n for n, s in catalog.items() if "bench" in s.tags]

    # Steady-state measurement: one unmeasured pass first, so JVM/codegen
    # warmup, ingest staging, and file-listing/footer reads are excluded —
    # on a long-lived cluster those are amortized across thousands of
    # queries.  Then two measured passes, keeping the per-query MINIMUM:
    # the min is the standard scheduler-noise-robust statistic for
    # wall-clock microbenchmarks (mean/max absorb CPU-steal spikes from
    # co-tenants; the min is the achievable steady-state).
    for name in bench_names:
        catalog[name].fn(spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    for _ in range(2):
        for name in bench_names:
            t0 = time.perf_counter()
            df = catalog[name].fn(spark, SF_DIR)
            df.collect()
            elapsed = round(time.perf_counter() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
