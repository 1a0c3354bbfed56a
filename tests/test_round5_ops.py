"""Semantic invariants for the round-5 operator batch (value-level parity
with DuckDB is covered by tests/test_oracle_parity.py; these assert the
properties the oracles can't express)."""

from parquet_query_spark.operators.graph import neardup_kcore
from parquet_query_spark.operators.scale_patterns import warehouse_forget_users
from parquet_query_spark.operators.similarity import (
    ann_recall_eval,
    embedding_pca_top_component,
)
from parquet_query_spark.operators.temporal import events_ewma_hourly


def test_ann_recall_bounds_and_total_row(spark, sf_dir):
    rows = ann_recall_eval(spark, sf_dir).collect()
    assert rows[0]["qid"] == -1  # overall row sorts first
    for r in rows:
        assert 0 <= r["n_hits"] <= r["n_exact"]
        assert 0 <= r["recall_bp"] <= 10000
    total = rows[0]
    assert total["n_exact"] == sum(r["n_exact"] for r in rows[1:])
    assert total["n_hits"] == sum(r["n_hits"] for r in rows[1:])


def test_pca_direction_is_max_normalized(spark, sf_dir):
    rows = embedding_pca_top_component(spark, sf_dir).collect()
    assert len(rows) == 64
    loadings = [r["loading_micro"] for r in rows]
    assert max(abs(x) for x in loadings) == 1_000_000


def test_forget_users_partitions_the_corpus(spark, sf_dir, views):
    rows = warehouse_forget_users(spark, sf_dir).collect()
    n_total = views["events"].count()
    assert sum(r["n_kept"] + r["n_deleted"] for r in rows) == n_total
    assert all(r["n_users_deleted"] <= r["n_deleted"] for r in rows)


def test_ewma_tracks_constant_series(spark, sf_dir):
    # EWMA of any series stays within [min, max] of its last 16 taps;
    # cheap global check: ewma in micro-units within corpus-wide bounds.
    rows = events_ewma_hourly(spark, sf_dir).collect()
    cents = [r["cents"] for r in rows]
    lo, hi = min(cents), max(cents)
    for r in rows:
        assert lo * 1_000_000 <= r["ewma_micro"] <= hi * 1_000_000 + 1


def test_kcore_trace_monotone(spark, sf_dir):
    rows = neardup_kcore(spark, sf_dir).collect()
    assert [r["round"] for r in rows] == list(range(6))
    for a, b in zip(rows, rows[1:]):
        assert b["n_nodes"] <= a["n_nodes"]
        assert b["n_edges"] <= a["n_edges"]
