"""Measure total shuffle write bytes + wall time for catalog ops.

Usage: python measure_shuffle.py <op> [<op> ...] [--sf DIR]

Creates its own SparkSession with the UI enabled and reads per-stage
shuffle metrics from the REST API after driving each op to completion —
the honest way to quantify a shuffle-payload change (e.g. the r12
xxhash64-shingle rewrite) without guessing from plans.  Prints one JSON
line per op: {"op", "sec", "shuffle_write_bytes", "rows"}.
"""

import json
import sys
import time
import urllib.request


def main() -> None:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]

    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    # UI must be on for the REST metrics endpoint.
    from pyspark.sql import SparkSession

    from parquet_query_spark import session as S

    S._DEFAULTS = dict(S._DEFAULTS)
    builder_patch = {"spark.ui.enabled": "true"}
    spark = (
        SparkSession.builder.master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
        .appName("measure_shuffle")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
    )
    for k, v in S._DEFAULTS.items():
        spark = spark.config(k, v)
    spark = spark.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ui = spark.sparkContext.uiWebUrl

    from parquet_query_spark.operators.catalog import load_all

    cat = load_all()

    def stage_totals():
        app = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10)
        )[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete",
                timeout=10,
            )
        )
        return sum(s.get("shuffleWriteBytes", 0) for s in stages), len(stages)

    for op in args:
        w0, _ = stage_totals()
        t0 = time.monotonic()
        rows = cat[op].fn(spark, sf).count()
        sec = time.monotonic() - t0
        w1, nst = stage_totals()
        print(
            json.dumps(
                {
                    "op": op,
                    "sec": round(sec, 3),
                    "shuffle_write_bytes": w1 - w0,
                    "rows": rows,
                    "sf": sf,
                }
            )
        )


if __name__ == "__main__":
    main()
