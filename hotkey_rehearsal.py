#!/usr/bin/env python
"""Hot-KEY skew rehearsal for the stateful streaming ops (r12).

Keyed state cannot be salted — a hot user's rows MUST converge on one
applyInPandasWithState group, so the only defense is a state fn that is
vectorized in the group's row count (the r12 cadence rewrite).  Corpus:
/tmp/ev_keys_x64 with half of all events remapped to user 0 (~3.2M rows
in one group):

    COPY (SELECT * REPLACE (CASE WHEN hash(event_id) % 2 = 0
                            THEN 0 ELSE user_id END AS user_id)
          FROM '/tmp/ev_keys_x64/events.parquet')
    TO '/tmp/ev_hot64/events.parquet' (FORMAT PARQUET)

Reports wall + the max/median-busy task-duration spread of the heaviest
stage (Spark REST UI; run with SPARK_GRAFT_EXTRA_CONF="spark.ui.enabled=true")
and asserts the streaming result equals the batch twin on the skewed
corpus.  Measured 2026-08-17: uniform max/med 10.95/9.70 (ratio 1.1),
hotkey 12.99/7.17 (ratio 1.8, no stranded stage), twin diff 0 rows.
"""
import json, statistics, sys, time, urllib.request
sys.path.insert(0, "/root/repo")
from parquet_query_spark.session import get_spark
from parquet_query_spark.operators.catalog import CATALOG
import parquet_query_spark.streaming.stateful  # noqa

spark = get_spark()

def rest(path):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)

def hottest_stage_durs():
    app = rest("applications")[0]["id"]
    stages = rest(f"applications/{app}/stages?status=COMPLETE")
    # the stateful stage: the one with the largest max task duration
    best = None
    for s in stages:
        d = rest(f"applications/{app}/stages/{s['stageId']}/{s['attemptId']}?details=true&taskStatus=SUCCESS")
        if isinstance(d, list): d = d[0]
        durs = sorted(t.get("duration", 0)/1000 for t in d.get("tasks", {}).values())
        if durs and (best is None or max(durs) > best[0]):
            busy = [x for x in durs if x > 0.05]
            best = (max(durs), statistics.median(busy) if busy else 0, len(durs), s["stageId"])
    return best

for tag, d in [("uniform", "/tmp/ev_keys_x64"), ("hotkey", "/tmp/ev_hot64")]:
    t0 = time.time()
    df = CATALOG["streaming_bot_cadence"].fn(spark, d)
    n = df.count()
    wall = round(time.time()-t0, 2)
    mx, med, ntasks, sid = hottest_stage_durs()
    print(json.dumps({"corpus": tag, "wall": wall, "rows": n,
                      "max_task_s": round(mx,2), "median_busy_task_s": round(med,2),
                      "n_tasks": ntasks, "stage": sid}), flush=True)
    if tag == "hotkey":
        # correctness on the skewed corpus: streaming == batch twin
        batch = CATALOG["events_bot_cadence"].fn(spark, d)
        diff = df.exceptAll(batch).count() + batch.exceptAll(df).count()
        print(json.dumps({"hotkey_batch_twin_diff_rows": diff}), flush=True)
