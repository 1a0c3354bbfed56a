#!/usr/bin/env python
"""Hot-band skew rehearsal for the MinHash LSH band join (VERDICT r9 #4).

A boilerplate paragraph duplicated into B documents puts all B copies in
ONE (band_id, band_val) bucket; the band self-join then emits B²/2 pairs.
That is join-key skew by OUTPUT: the hot bucket's slim input rows total a
few hundred KB, far below AQE's skewedPartitionThresholdInBytes, so the
input-size-based skew split never engages — the engine's defense is the
chunk-tiled self-join in ``_lsh_candidate_pairs_with_shingles``
(operators/dedup.py), which bounds every task at ≤ C² candidate pairs.

This script runs ``dedup_minhash_candidate_pairs`` on a hot corpus
(``scale_data.py --bounded-dup --hot-cluster B``) and reports, for the
stage that produced the most shuffle-write records (the tile join), the
per-task shuffle-write-record distribution: max, median-of-nonzero, and
their ratio.  Pre-tiling, one task held ~100% of the pair volume; the
tiled plan must keep max ≤ 2× the median of busy tasks.

Usage:
  python scale_data.py --dst /tmp/hot_x64 --factor 64 --bounded-dup \
      --hot-cluster 16000
  python skew_rehearsal.py --sf-dir /tmp/hot_x64 [--op dedup_minhash_candidate_pairs]

Writes one JSON line to stdout; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def task_write_distribution(spark):
    """Per-task shuffle-write records for the completed stage with the
    largest total shuffle-write record count (the pair-producing join)."""
    base = spark.sparkContext.uiWebUrl
    app = _rest(base, "applications")[0]["id"]
    stages = _rest(base, f"applications/{app}/stages?status=COMPLETE")
    hot = max(stages, key=lambda s: s.get("shuffleWriteRecords", 0))
    detail = _rest(
        base,
        f"applications/{app}/stages/{hot['stageId']}/"
        f"{hot['attemptId']}?details=true&taskStatus=SUCCESS",
    )
    if isinstance(detail, list):
        detail = detail[0]
    tasks = detail.get("tasks", {})
    writes = sorted(
        t.get("taskMetrics", {})
        .get("shuffleWriteMetrics", {})
        .get("recordsWritten", 0)
        for t in tasks.values()
    )
    busy = [w for w in writes if w > 0]
    out = {
        "stage_id": hot["stageId"],
        "stage_name": hot["name"][:80],
        "total_write_records": hot.get("shuffleWriteRecords", 0),
        "n_tasks": len(writes),
        "n_busy_tasks": len(busy),
        "max_task_records": max(writes) if writes else 0,
        "median_busy_records": int(statistics.median(busy)) if busy else 0,
        "max_over_median": (
            round(max(writes) / statistics.median(busy), 2) if busy else None
        ),
    }
    # r11: the inline-verify join shapes keep the pair explosion OUT of
    # the shuffle entirely — there skew manifests as task DURATION on the
    # join stage, not write records.  Report the duration distribution of
    # the stage with the largest summed task time as a second lens.
    def _durs(stage):
        d = _rest(
            base,
            f"applications/{app}/stages/{stage['stageId']}/"
            f"{stage['attemptId']}?details=true&taskStatus=SUCCESS",
        )
        if isinstance(d, list):
            d = d[0]
        return sorted(
            t.get("duration", 0) for t in d.get("tasks", {}).values()
        )
    slow = max(stages, key=lambda s: s.get("executorRunTime", 0))
    durs = _durs(slow)
    busy_d = [x for x in durs if x > 0] or [0]
    out.update(
        {
            "slowest_stage_id": slow["stageId"],
            "slowest_stage_name": slow["name"][:80],
            "stage_executor_run_ms": slow.get("executorRunTime", 0),
            "max_task_ms": max(durs) if durs else 0,
            "median_busy_task_ms": int(statistics.median(busy_d)),
            "max_over_median_ms": (
                round(max(durs) / statistics.median(busy_d), 2)
                if durs and statistics.median(busy_d) > 0
                else None
            ),
        }
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/hot_x64")
    ap.add_argument("--op", default="dedup_minhash_candidate_pairs")
    ap.add_argument(
        "--chunk-c", type=int, default=None,
        help="override dedup._BAND_CHUNK_C — pass a huge value (1e9) to "
        "reproduce the pre-tiling single-task plan as the 'before' row",
    )
    args = ap.parse_args()

    # get_spark disables the UI; the task-metric REST API needs it.  Own
    # the session: create it first with the UI on (ui.enabled is a static
    # conf — unreachable once the session exists), then let
    # ensure_session_confs apply the engine's runtime SQL confs.
    from pyspark.sql import SparkSession

    from parquet_query_spark.operators.catalog import load_all
    from parquet_query_spark.session import ensure_session_confs

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("skew-rehearsal")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "2000")
        .config("spark.ui.retainedTasks", "200000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ensure_session_confs(spark)

    if args.chunk_c is not None:
        from parquet_query_spark.operators import dedup

        if args.op == "fuzzy_join_rarest_token":
            dedup._FUZZY_CHUNK_C = args.chunk_c
        else:
            dedup._BAND_CHUNK_C = args.chunk_c

    spec = load_all()[args.op]
    t0 = time.time()
    n = spec.fn(spark, args.sf_dir).count()
    sec = round(time.time() - t0, 2)
    dist = task_write_distribution(spark)
    print(json.dumps({"op": args.op, "sf_dir": args.sf_dir,
                      "chunk_c": args.chunk_c, "sec": sec,
                      "result_rows": n, **dist}))


if __name__ == "__main__":
    main()
