"""Round-14 optimization pins (VERDICT r13 follow-ups)."""

import pytest

from parquet_query_spark.operators.catalog import CATALOG, load_all

load_all()


SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from parquet_query_spark.session import get_spark

    return get_spark("test-round14")


def test_km_k_eff_is_capped():
    """VERDICT r13 #3: the adaptive K must be bounded independent of
    corpus size — the centroid state is driver-collected and broadcast."""
    from parquet_query_spark.operators import similarity as S

    # below the cap: unchanged adaptive formula
    assert S._km_k_eff(2001) == S._KM_K
    assert S._km_k_eff(8_192_000) == -(-8_192_000 // S._KM_TARGET_CLUSTER)
    # at/above the engagement point: hard cap
    assert S._km_k_eff(S._KM_MAX_K * S._KM_TARGET_CLUSTER + 1) == S._KM_MAX_K
    assert S._km_k_eff(10**12) == S._KM_MAX_K
    # cap arithmetic stated in BASELINE.md: ~0.55 GB broadcast at dim 64
    assert S._KM_MAX_K * (S._DIM + 2) * 8 < (1 << 30)


def test_state_partitions_adaptive_sizing(spark, monkeypatch):
    """VERDICT r13 #5: streaming state partitions size from source bytes,
    clamped to [cores, 32*cores], env knob wins."""
    from parquet_query_spark.streaming import streaming_ops as SO

    cpus = spark.sparkContext.defaultParallelism
    monkeypatch.setattr(SO, "_LAST_SOURCE_BYTES", 0)
    assert SO._state_partitions(spark) == cpus          # tiny corpus: full parallelism
    monkeypatch.setattr(SO, "_LAST_SOURCE_BYTES", 9 << 30)
    assert SO._state_partitions(spark) == max(cpus, 145)  # ~64 MB per partition
    monkeypatch.setattr(SO, "_LAST_SOURCE_BYTES", 1 << 50)
    assert SO._state_partitions(spark) == 32 * cpus     # upper clamp
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PARTS", "7")
    assert SO._state_partitions(spark) == 7             # override wins


def test_files_sink_empty_fallback_coexists_with_batch_dirs(spark, tmp_path, monkeypatch):
    """ADVICE r13: the empty-output fallback must not mix flat parquet
    with per-batch partition dirs (partition discovery would fail with
    'Conflicting directory structures')."""
    import os

    from pyspark.sql import types as T

    out_dir = str(tmp_path / "sink")
    schema = T.StructType([T.StructField("k", T.LongType())])
    # simulate a replayed micro-batch that left only a batch dir with no rows
    os.makedirs(os.path.join(out_dir, "pqs_sink_batch=0"))
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(
        os.path.join(out_dir, "pqs_sink_batch=-1")
    )
    # discovery over the mixed dirs must succeed and select() must drop
    # the partition column, as _run_to_table does
    got = spark.read.parquet(out_dir).select("k")
    assert got.collect() == []


def test_km_cap_engages_and_pipeline_still_runs(spark, monkeypatch):
    """With the cap forced below the adaptive K, the Lloyd pipeline must
    run end-to-end and emit no more than _KM_MAX_K clusters."""
    from parquet_query_spark.operators import similarity as S

    monkeypatch.setattr(S, "_KM_SMALL_N", 0)   # force the adaptive regime
    monkeypatch.setattr(S, "_KM_MAX_K", 4)     # engage the cap (k_eff 8 -> 4)
    assign = S._km_final_assign(spark, SF01)
    cids = {r.cid for r in assign.select("cid").distinct().collect()}
    assert 0 < len(cids) <= 4
    assert cids <= set(range(4))  # init centroids are vec_id < k_eff
