"""Semantic checks for the round-6 operators — invariants the oracle
hash-compare can't express (bounds, internal consistency, idempotence).
Oracle value-parity itself is covered by test_oracle_parity.py's
parametrized sweep."""

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def catalog():
    from parquet_query_spark.operators.catalog import load_all

    return load_all()


@pytest.fixture(scope="module")
def spark():
    from parquet_query_spark.session import get_spark

    return get_spark("test-round6")


SF = "/root/testdata/sf0.01"


def test_norm_outliers_are_extreme(catalog, spark):
    rows = catalog["embedding_norm_outliers"].fn(spark, SF).collect()
    assert rows, "sf0.01 embeddings should contain some 2-sigma norms"
    assert all(abs(r.z) >= 2.0 for r in rows)


def test_centroid_drift_is_symmetric_bounded(catalog, spark):
    rows = catalog["embedding_label_centroid_drift"].fn(spark, SF).collect()
    labels = {r.label_a for r in rows} | {r.label_b for r in rows}
    n = len(labels)
    assert len(rows) == n * (n - 1) // 2  # every unordered pair exactly once
    assert all(-1.0 <= r.centroid_cosine <= 1.0 for r in rows)


def test_peak_hours_are_local_maxima(catalog, spark):
    rows = catalog["events_peak_hours"].fn(spark, SF).collect()
    for r in rows:
        assert r.n > r.prev_n and r.n >= r.next_n
        assert float(r.n) >= 1.2 * r.baseline - 0.01


def test_trigram_entropy_bounds(catalog, spark):
    rows = catalog["text_char_trigram_entropy"].fn(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        # +5e-5: the op rounds to 4dp, which can tip a perfectly uniform
        # doc (entropy == ln n_distinct) just past the bound
        assert 0.0 <= r.trigram_entropy_nats <= math.log(max(r.n_distinct, 1)) + 5e-5


def test_token_budget_shares_sum_to_one(catalog, spark):
    rows = catalog["pipeline_token_budget_mix"].fn(spark, SF).collect()
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 0.01
    assert abs(sum(r.target_share for r in rows) - 1.0) < 0.01
    # uniform target over N sources: epochs > 1 iff under-represented
    for r in rows:
        assert (r.epochs_at_budget > 1.0) == (r.observed_share < r.target_share)


def test_snapshot_diff_partitions_the_key_space(catalog, spark):
    rows = {r.status: r for r in catalog["warehouse_snapshot_diff"].fn(spark, SF).collect()}
    assert set(rows) == {"added", "removed", "changed", "unchanged"}
    from parquet_query_spark.operators.catalog import views

    n_orders = views(spark, SF)["orders"].count()
    union = sum(r.n for r in rows.values())
    # every order key appears in at least one snapshot unless dropped by both mods
    dropped_by_both = (
        views(spark, SF)["orders"]
        .where((F.col("o_orderkey") % 97 == 0) & (F.col("o_orderkey") % 101 == 0))
        .count()
    )
    assert union == n_orders - dropped_by_both


def test_rolling_zscore_windows_complete(catalog, spark):
    rows = catalog["lineitem_rolling_revenue_zscore"].fn(spark, SF).collect()
    assert rows
    months = [r.ship_month for r in rows]
    assert months == sorted(months)


def test_contamination_rate_consistent(catalog, spark):
    rows = catalog["text_contamination_hit_rate"].fn(spark, SF).collect()
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_docs
        assert r.hit_rate_bp == r.n_contaminated * 10000 // r.n_docs


def test_incremental_minhash_equals_full_recompute(catalog, spark):
    inc = (
        catalog["incremental_minhash_update"]
        .fn(spark, SF)
        .drop("provenance")
        .collect()
    )
    full = catalog["dedup_minhash_signatures"].fn(spark, SF).collect()
    assert [tuple(r) for r in inc] == [tuple(r) for r in full]


def test_streaming_decontaminate_agrees_with_batch_audit(catalog, spark):
    gate = {
        r.source: r
        for r in catalog["streaming_ingest_decontaminate"].fn(spark, SF).collect()
    }
    audit = {
        r.source: r
        for r in catalog["text_contamination_hit_rate"].fn(spark, SF).collect()
    }
    assert set(gate) == set(audit)
    for src, g in gate.items():
        a = audit[src]
        assert g.n_seen == a.n_docs
        assert g.n_rejected == a.n_contaminated


def test_datetime_sweep_dow_range(catalog, spark):
    rows = catalog["scalar_datetime_functions"].fn(spark, SF).limit(200).collect()
    for r in rows:
        assert 0 <= r.dow_sun0 <= 6
        assert 1 <= r.q <= 4
        assert r.month_end >= r.quarter_start


def test_mode_bounded_by_total(catalog, spark):
    rows = catalog["agg_exact_mode_per_group"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.mode_n <= r.total_n


def test_outage_windows_ordered_nonoverlapping(catalog, spark):
    rows = catalog["events_outage_windows"].fn(spark, SF).collect()
    for prev, cur in zip(rows, rows[1:]):
        assert prev.gap_end <= cur.gap_start
    for r in rows:
        assert r.silent_minutes >= 5


def test_dimension_profile_consistent(catalog, spark):
    rows = catalog["embedding_dimension_profile"].fn(spark, SF).collect()
    assert len(rows) == 64
    for r in rows:
        assert r.min_x <= r.mean <= r.max_x
        assert (r.is_dead == 1) == (r.std < 0.01)
