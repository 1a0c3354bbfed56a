"""Multi-batch streaming verification (VERDICT r7 Next-round #3).

Every streaming operator is normally driven by ``processAllAvailable()``
over ONE static parquet file, which drains in a single micro-batch — so
cross-batch behavior of order-sensitive state (EWMA ring, OHLC merge,
cadence gap moments, ingest-dedup admission) was never exercised.  Here
the events/documents tables are split into TWO time-ordered part files
inside a ``<table>.parquet`` DIRECTORY and the stream runs with
``maxFilesPerTrigger=1``, forcing state across a real batch boundary;
output must still match the batch DuckDB oracle bit-for-bit.

The r8 cross-batch fixes this pins: a boundary-split hour merges into
its existing EWMA ring slot (and re-emits under a higher seq) instead of
appending a duplicate bar, and update-mode emitters dedup to the final
emission per key.
"""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_query_spark.operators.catalog import load_all
from parquet_query_spark.oracle import compare
from parquet_query_spark.streaming import streaming_ops

CATALOG = load_all()
SF_SRC = "/root/testdata/sf0.001"

MULTIBATCH_OPS = [
    "streaming_ewma_hourly",
    "streaming_hourly_ohlc",
    "streaming_bot_cadence",
    "streaming_corpus_ingest_dedup",
    "streaming_stateful_user_totals",
    "streaming_tumbling_counts",
]


def _split_table(src_file: str, dst_dir: str, sort_cols: list[str], mid: int | None = None) -> None:
    """Write ``dst_dir/part-0000{0,1}.parquet`` as the time-ordered halves
    of ``src_file``; mtimes are staggered so the file stream source picks
    part-00000 first."""
    t = pq.read_table(src_file)
    if sort_cols:
        t = t.sort_by([(c, "ascending") for c in sort_cols])
    os.makedirs(dst_dir, exist_ok=True)
    if mid is None:
        mid = t.num_rows // 2
    for i, chunk in enumerate([t.slice(0, mid), t.slice(mid)]):
        path = os.path.join(dst_dir, f"part-0000{i}.parquet")
        pq.write_table(chunk, path, version="2.6")
        os.utime(path, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))


def _mid_hour_split_point(src_file: str) -> int:
    """A split index INSIDE an hour bucket, so the boundary hour's events
    span both part files — without this the EWMA merge path (the actual
    cross-batch fix) never runs.  Picks the middle of the hour group
    containing the median row and asserts the hour truly splits."""
    import pandas as pd

    df = (
        pq.read_table(src_file, columns=["ts", "event_id", "event_type"])
        .to_pandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    hours = pd.to_datetime(df["ts"]).dt.floor("h")
    # the busiest hour is guaranteed splittable (and, being busy, almost
    # surely has several event types on both sides of its midpoint)
    busy_hour = hours.value_counts().idxmax()
    grp = hours[hours == busy_hour]
    mid = int((grp.index[0] + grp.index[-1] + 1) // 2)
    assert hours.iloc[mid - 1] == hours.iloc[mid], "split must land mid-hour"
    # at least one event_type must have rows in this hour on BOTH sides —
    # the per-key state machine merges per (event_type, hour)
    left = set(df["event_type"][(hours == busy_hour) & (df.index < mid)])
    right = set(df["event_type"][(hours == busy_hour) & (df.index >= mid)])
    assert left & right, "no event_type spans the boundary hour"
    return mid


@pytest.fixture(scope="module")
def split_sf(tmp_path_factory):
    """sf0.001 with events+documents each split into a 2-file directory."""
    root = str(tmp_path_factory.mktemp("sf_split"))
    for f in os.listdir(SF_SRC):
        src = os.path.join(SF_SRC, f)
        if f == "events.parquet":
            _split_table(
                src, os.path.join(root, f), ["ts", "event_id"],
                mid=_mid_hour_split_point(src),
            )
        elif f == "documents.parquet":
            _split_table(src, os.path.join(root, f), ["doc_id"])
        else:
            shutil.copy(src, os.path.join(root, f))
    return root


@pytest.fixture(autouse=True)
def one_file_per_trigger():
    streaming_ops._STREAM_READ_OPTIONS["maxFilesPerTrigger"] = "1"
    yield
    streaming_ops._STREAM_READ_OPTIONS.clear()


@pytest.mark.parametrize("name", MULTIBATCH_OPS)
def test_multibatch_matches_batch_oracle(spark, split_sf, name):
    spec = CATALOG[name]
    df = spec.fn(spark, split_sf)
    report = compare(spark, split_sf, df, spec.oracle)
    assert streaming_ops.LAST_NUM_BATCHES >= 2, (
        f"{name} drained in {streaming_ops.LAST_NUM_BATCHES} batch(es) — "
        "state never crossed a micro-batch boundary"
    )
    assert report["match"], report
