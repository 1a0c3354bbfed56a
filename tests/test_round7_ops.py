"""Semantic checks for the round-7 operators — invariants the oracle
hash-compare can't express (bounds, internal consistency, mergeability).
Oracle value-parity itself is covered by test_oracle_parity.py's
parametrized sweep."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def catalog():
    from parquet_query_spark.operators.catalog import load_all

    return load_all()


@pytest.fixture(scope="module")
def spark():
    from parquet_query_spark.session import get_spark

    return get_spark("test-round7")


SF = "/root/testdata/sf0.01"


def test_backlog_burndown_conserves_orders(catalog, spark):
    rows = catalog["orders_backlog_burndown"].fn(spark, SF).collect()
    assert rows
    # deltas must conserve: backlog starts at first month's net and ends at 0
    assert rows[-1].open_backlog == 0
    assert sum(r.net_delta for r in rows) == 0
    assert all(r.open_backlog >= 0 for r in rows)
    # cumulative consistency
    run = 0
    for r in rows:
        run += r.net_delta
        assert run == r.open_backlog


def test_weighted_median_within_range(catalog, spark):
    from parquet_query_spark.operators.catalog import views

    rows = catalog["agg_weighted_median"].fn(spark, SF).collect()
    v = views(spark, SF)
    bounds = {
        r.flag: r
        for r in v["lineitem"]
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
        .collect()
    }
    assert len(rows) == 3
    for r in rows:
        assert bounds[r.flag].lo <= r.weighted_median <= bounds[r.flag].hi


def test_sliding_distinct_users_dominates_hourly(catalog, spark):
    from parquet_query_spark.operators.catalog import views

    sliding = {
        r.window_end: r.users_24h
        for r in catalog["events_sliding_distinct_users"].fn(spark, SF).collect()
    }
    v = views(spark, SF)
    hourly = {
        r.hour: r.u
        for r in v["events"]
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count_distinct("user_id").alias("u"))
        .collect()
    }
    # a 24h trailing window can never see fewer users than its last hour
    for hour, u in hourly.items():
        assert sliding[hour] >= u


def test_bottom_k_sample_is_mergeable(catalog, spark):
    """bottom_k(A ∪ B) == bottom_k(bottom_k(A) ∪ bottom_k(B)) — the
    property that makes the sample unionable across shards/days."""
    from parquet_query_spark.functions.xxh64_sql import MASK56
    from parquet_query_spark.operators.catalog import views

    v = views(spark, SF)
    keyed = v["orders"].select(
        "o_orderkey", F.expr(f"xxhash64(o_orderkey) & {MASK56}").alias("draw")
    )
    whole = [r.o_orderkey for r in keyed.orderBy("draw").limit(100).collect()]
    lo = keyed.where(F.col("o_orderkey") % 2 == 0).orderBy("draw").limit(100)
    hi = keyed.where(F.col("o_orderkey") % 2 == 1).orderBy("draw").limit(100)
    merged = [
        r.o_orderkey for r in lo.unionAll(hi).orderBy("draw").limit(100).collect()
    ]
    assert whole == merged
    # and it matches the catalog operator
    op = [r.o_orderkey for r in catalog["sample_bottom_k_mergeable"].fn(spark, SF).collect()]
    assert op == whole


def test_multimodal_dupes_hash_binary_not_text(catalog, spark):
    rows = catalog["multimodal_exact_dupes_by_hash"].fn(spark, SF).collect()
    assert rows, "sf0.01 should contain payload-identical documents"
    assert all(r.n_copies >= 2 for r in rows)
    assert {r.fmt for r in rows} <= {"png", "jpeg", "gif"}


def test_c4_filters_pass_rate_bounds(catalog, spark):
    rows = catalog["text_c4_quality_filters"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.pass_rate <= 1.0
        for col in ("no_terminal_punct", "too_short", "bad_word_len", "has_brace", "has_lorem"):
            assert 0 <= getattr(r, col) <= r.n_docs


def test_curriculum_deciles_partition_corpus(catalog, spark):
    rows = catalog["pipeline_curriculum_order"].fn(spark, SF).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.n_docs for r in rows) == 500
    # quality ordering: decile 1 has the highest scores
    for a, b in zip(rows, rows[1:]):
        assert a.min_score >= b.max_score - 1e-9


def test_mix_shift_shares_sum_to_one(catalog, spark):
    rows = catalog["lineitem_returnflag_mix_shift"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.chi2 >= 0.0
        assert abs(r.share_a + r.share_n + r.share_r - 1.0) < 2e-4


def test_fano_nonnegative_and_sorted(catalog, spark):
    rows = catalog["events_burstiness_fano"].fn(spark, SF).collect()
    assert rows
    assert all(r.fano >= 0 for r in rows)
    assert [r.fano for r in rows] == sorted((r.fano for r in rows), reverse=True)


def test_vocab_coverage_monotone(catalog, spark):
    rows = catalog["vocab_coverage_curve"].fn(spark, SF).collect()
    ns = [r.top_n for r in rows]
    covs = [r.coverage for r in rows]
    assert ns == sorted(ns)
    assert covs == sorted(covs)  # more vocab → more coverage
    assert all(0.0 < c <= 1.0 for c in covs)


def test_rolling_median_within_frame_bounds(catalog, spark):
    rows = catalog["window_rolling_median_revenue"].fn(spark, SF).collect()
    assert rows
    for i, r in enumerate(rows):
        frame = [x.revenue for x in rows[max(0, i - 6) : i + 1]]
        assert min(frame) - 0.01 <= r.rolling_median_7d <= max(frame) + 0.01


def test_band_tuning_scurve_monotone(catalog, spark):
    rows = catalog["dedup_band_tuning_table"].fn(spark, SF).collect()
    assert len(rows) == 35  # 7 factorizations × 5 similarity levels
    # p_candidate rises with jaccard for a fixed layout
    from collections import defaultdict

    by_layout = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r.bands, r.jaccard)):
        by_layout[(r.bands, r.rows_per_band)].append(r.p_candidate)
    for ps in by_layout.values():
        assert ps == sorted(ps)


def test_correlation_values_in_range(catalog, spark):
    row = catalog["profile_numeric_correlations"].fn(spark, SF).collect()[0]
    for v in row.asDict().values():
        assert -1.0 <= v <= 1.0


def test_regex_sweep_counts_consistent(catalog, spark):
    rows = catalog["scalar_regex_functions"].fn(spark, SF).limit(50).collect()
    for r in rows:
        assert r.long_words <= r.n_tokens
        assert len(r.devoweled_prefix) <= 80


def test_nprobe_sweep_monotone_tradeoff(catalog, spark):
    rows = catalog["embedding_ivf_nprobe_sweep"].fn(spark, SF).collect()
    assert [r.nprobe for r in rows] == [1, 2, 3]
    recalls = [r.recall_bp for r in rows]
    scanned = [r.scanned_bp for r in rows]
    # more probed cells → recall and scan share both non-decreasing
    assert recalls == sorted(recalls)
    assert scanned == sorted(scanned)
    assert all(0 <= r <= 10000 for r in recalls)
    assert all(0 < s <= 10000 for s in scanned)


def test_mix_rebalance_deltas_consistent(catalog, spark):
    rows = catalog["pipeline_mix_rebalance_delta"].fn(spark, SF).collect()
    assert rows
    # temperature 0.5 flattens: over-represented sources lose, small gain
    for r in rows:
        if r.current_bp > r.target_bp:
            assert r.token_delta <= 0
        elif r.current_bp < r.target_bp:
            assert r.token_delta >= 0
        assert 0 <= r.target_bp <= 10000


def test_mann_kendall_statistics_consistent(catalog, spark):
    rows = catalog["events_trend_mann_kendall"].fn(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        max_s = r.n_days * (r.n_days - 1) // 2
        assert -max_s <= r.s_stat <= max_s
        assert r.var18 > 0
        assert r.trend in ("rising", "falling", "none")
        # z sign follows S sign; 1.96 gate matches the label
        if r.trend == "rising":
            assert r.z_mk > 1.96 and r.s_stat > 0
        elif r.trend == "falling":
            assert r.z_mk < -1.96 and r.s_stat < 0


def test_zipf_fit_plausible(catalog, spark):
    rows = catalog["text_zipf_law_fit"].fn(spark, SF).collect()
    assert len(rows) == 20  # one per source
    for r in rows:
        assert r.n_terms <= 100
        assert 0.0 <= r.zipf_r2 <= 1.0
        # natural-ish text: positive decay exponent in a sane band
        assert 0.05 <= r.zipf_slope <= 3.0
