#!/usr/bin/env python
"""Per-query profiling for the bench set: wall time + per-job/stage
breakdown from the REST API (UI enabled in this session only).

Usage: python plans/r13/profile_bench.py [names...]

For each query: one warmup collect, then a measured collect bracketed by
setJobDescription; prints the query's jobs with per-stage wall, shuffle
read/write bytes, and task time so the expensive stage is identifiable.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    only = set(sys.argv[1:])
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from parquet_query_spark import session as S

    builder = (
        SparkSession.builder.master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
        .appName("profile-bench")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
    )
    for k, v in S._DEFAULTS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from parquet_query_spark.functions.similarity_udfs import register_similarity_udfs
    from parquet_query_spark.functions.unicode_udfs import register_unicode_udfs

    register_similarity_udfs(spark)
    register_unicode_udfs(spark)
    ui = spark.sparkContext.uiWebUrl

    from parquet_query_spark.operators.catalog import load_all

    catalog = load_all()
    names = [n for n, s in catalog.items() if "bench" in s.tags]
    if only:
        names = [n for n in names if n in only]

    def api(path):
        return json.load(urllib.request.urlopen(f"{ui}/api/v1/{path}", timeout=10))

    app = api("applications")[0]["id"]

    for name in names:
        # warmup
        catalog[name].fn(spark, SF_DIR).collect()
        spark.sparkContext.setJobDescription(f"PROFILE:{name}")
        t0 = time.perf_counter()
        catalog[name].fn(spark, SF_DIR).collect()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)

        jobs = [
            j
            for j in api(f"applications/{app}/jobs")
            if j.get("description") == f"PROFILE:{name}"
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = api(f"applications/{app}/stages?status=complete")
        by_id = {}
        for st in stages:
            sid = st["stageId"]
            if sid in stage_ids:
                by_id[sid] = st
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs, {len(stage_ids)} stages ===")
        for sid in stage_ids:
            st = by_id.get(sid)
            if not st:
                print(f"  stage {sid}: (skipped/missing)")
                continue
            dur = (st.get("executorRunTime") or 0) / 1000.0
            sw = (st.get("shuffleWriteBytes") or 0) / 1e6
            sr = (st.get("shuffleReadBytes") or 0) / 1e6
            inp = (st.get("inputBytes") or 0) / 1e6
            n = st.get("numCompleteTasks")
            first = (st.get("firstTaskLaunchedTime") or "")[11:23]
            print(
                f"  stage {sid:4d} [{first}]: taskTime {dur:7.2f}s  tasks {n:4d}  "
                f"input {inp:8.1f}MB  sRead {sr:8.2f}MB  sWrite {sw:8.2f}MB  | {st['name'][:70]}"
            )


if __name__ == "__main__":
    main()
