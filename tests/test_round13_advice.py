"""Round-13 ADVICE + VERDICT correctness fixes, pinned.

1. CTAS OR REPLACE swaps via rename-to-backup: a RENAME failure after the
   target was moved aside restores the original instead of losing both
   copies (r12 VERDICT #2).
2. Files-sink micro-batches write to per-batch dirs with overwrite, so a
   checkpoint-recovery replay of a batch is idempotent (ADVICE r12), and
   sink dirs are tracked for removal at interpreter exit (ADVICE r12).
3. _km_assign_np centroid broadcasts are tracked and unpersisted when
   superseded — the Lloyd loop no longer accumulates one K×dim broadcast
   per iteration per catalog run (ADVICE r12).
4. A zero-norm (degenerate) centroid loses the scan-side cell argmax
   (NULL cosine coalesced to -1) instead of winning it via NULL-first
   struct sort (ADVICE r12).
"""

import pytest


@pytest.fixture(scope="module")
def engine(sf_dir):
    from parquet_query_spark.engine import Engine

    return Engine.open(sf_dir, table_name="alldata")


# ── 1. OR REPLACE rename-failure restores the original ──────────────────


def test_ctas_or_replace_rename_failure_restores_original(engine, monkeypatch):
    """Inject a one-shot failure into the promotion RENAME: the swap must
    restore the original table (via the backup name) and drop the staging
    table — never lose both copies the way drop-then-rename could."""
    n = "__r13_swapfail"
    engine.exec(f"DROP TABLE IF EXISTS {n}")
    engine.sql(f"CREATE TABLE {n} AS SELECT 1 AS x")
    spark = engine.spark
    real_sql = spark.sql
    fails = {"left": 1}

    def flaky(stmt, *a, **kw):
        if (
            isinstance(stmt, str)
            and "RENAME TO" in stmt
            and stmt.rstrip().endswith(f"`{n}`")
            and fails["left"] > 0
        ):
            fails["left"] -= 1
            raise RuntimeError("injected catalog hiccup")
        return real_sql(stmt, *a, **kw)

    monkeypatch.setattr(spark, "sql", flaky)
    with pytest.raises(RuntimeError, match="injected catalog hiccup"):
        engine.sql(f"CREATE OR REPLACE TABLE {n} AS SELECT 2 AS x")
    monkeypatch.undo()
    # the original contents survive under the original name
    assert [r[0] for r in engine.sql(f"SELECT x FROM {n}").collect()] == [1]
    # no staging/backup tables leak
    leftovers = [
        t.name for t in spark.catalog.listTables() if "__ctas_swap" in t.name
    ]
    assert leftovers == []
    engine.exec(f"DROP TABLE {n}")


def test_ctas_or_replace_still_swaps_cleanly(engine):
    """The happy path through the new backup-swap: replaced contents land,
    nothing leaks."""
    n = "__r13_swapok"
    engine.exec(f"DROP TABLE IF EXISTS {n}")
    engine.sql(f"CREATE TABLE {n} AS SELECT 1 AS x")
    engine.sql(f"CREATE OR REPLACE TABLE {n} AS SELECT x + 10 AS x FROM {n}")
    assert [r[0] for r in engine.sql(f"SELECT x FROM {n}").collect()] == [11]
    leftovers = [
        t.name for t in engine.spark.catalog.listTables() if "__ctas_swap" in t.name
    ]
    assert leftovers == []
    engine.exec(f"DROP TABLE {n}")


# ── 2. files sink: per-batch overwrite is replay-idempotent ──────────────


def test_files_sink_batch_replay_is_idempotent(spark, tmp_path):
    """Re-running a micro-batch write with the same batch_id must not
    duplicate rows — the foreachBatch writer owns a batch=<id> dir and
    overwrites it wholesale (the contract checkpoint recovery assumes)."""
    import os

    from parquet_query_spark.streaming import streaming_ops as so

    out_dir = str(tmp_path / "sink")
    os.makedirs(out_dir)

    # reproduce the update-mode branch of _write_batch
    def write_batch(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    df = spark.range(5).withColumnRenamed("id", "v")
    write_batch(df, 0)
    write_batch(df, 0)  # replay of the SAME batch id
    write_batch(df, 1)
    got = spark.read.parquet(out_dir)
    assert got.count() == 10  # 5 (batch 0, once) + 5 (batch 1) — no dupes
    # _run_to_table drops the discovery column via select(schema names)
    assert sorted(got.select("v").columns) == ["v"]
    # and the sink-dir registry exists for exit-time cleanup
    assert isinstance(so._SINK_DIRS, list)


def test_files_sink_registers_dirs_for_cleanup(spark, monkeypatch):
    import os

    from parquet_query_spark.operators.catalog import load_all
    from parquet_query_spark.streaming import streaming_ops as so

    monkeypatch.setenv("SPARK_GRAFT_STREAM_SINK", "files")
    before = len(so._SINK_DIRS)
    load_all()["streaming_tumbling_counts"].fn(spark, "/root/testdata/sf0.001")
    assert len(so._SINK_DIRS) == before + 1
    assert os.path.isdir(so._SINK_DIRS[-1])


# ── 3. centroid broadcasts are released when superseded ─────────────────


def test_km_broadcast_pool_bounded(spark):
    """After a full adaptive-K Lloyd run, at most ONE tracked broadcast
    remains (the returned DataFrame's); a second run releases it too."""
    import parquet_query_spark.operators.similarity as S

    # force the numpy-broadcast path at tiny N so the test is cheap
    orig = S._KM_SMALL_N
    try:
        S._KM_SMALL_N = 0
        S._km_final_assign(spark, "/root/testdata/sf0.001").collect()
        assert len(S._KM_LIVE_BC) <= 1
        first = list(S._KM_LIVE_BC)
        S._km_final_assign(spark, "/root/testdata/sf0.001").collect()
        assert len(S._KM_LIVE_BC) <= 1
        # the previous run's broadcast was released from the pool
        assert not (set(first) & set(S._KM_LIVE_BC))
    finally:
        S._KM_SMALL_N = orig


# ── 4. degenerate centroid loses the cell argmax ─────────────────────────


def test_assign_cells_degenerate_centroid_loses(spark):
    """A zero-norm centroid yields NULL cosine; it must NOT win the argmax
    (the pre-r12-window semantics: desc sim NULLS LAST made it lose)."""
    from pyspark.sql import functions as F

    from parquet_query_spark.operators.similarity import _assign_cells_scanside

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, ev array<double>"
    )
    cents = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])]  # cid 0 degenerate
    got = {
        r.vec_id: r.c_label
        for r in _assign_cells_scanside(emb, cents).select("vec_id", "c_label").collect()
    }
    assert got == {1: 1, 2: 2}  # never cid 0
