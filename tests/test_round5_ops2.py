"""Semantic invariants for the later round-5 operator batches (value-level
DuckDB parity is covered by tests/test_oracle_parity.py)."""

from parquet_query_spark.operators.catalog import load_all

CATALOG = load_all()


def _rows(spark, sf_dir, name):
    return CATALOG[name].fn(spark, sf_dir).collect()


def test_cms_never_underestimates(spark, sf_dir):
    for r in _rows(spark, sf_dir, "agg_cms_heavy_hitters"):
        assert r["cms_n"] >= r["exact_n"]
        assert r["overcount"] == r["cms_n"] - r["exact_n"]


def test_containment_dominates_jaccard(spark, sf_dir):
    for r in _rows(spark, sf_dir, "dedup_minhash_containment"):
        assert r["cont_a_in_b"] >= r["jaccard"] - 1e-9
        assert r["cont_b_in_a"] >= r["jaccard"] - 1e-9
        assert r["relation"] in ("near_dup", "containment", "overlap")


def test_basket_lift_positive_and_support_bounds(spark, sf_dir):
    for r in _rows(spark, sf_dir, "orders_basket_pairs"):
        assert r["n_ab"] >= 2
        assert r["n_ab"] <= min(r["n_a"], r["n_b"])
        assert r["lift"] > 0


def test_funnel_monotone_and_bounded(spark, sf_dir):
    rows = _rows(spark, sf_dir, "pipeline_funnel_report")
    assert [r["stage"] for r in rows] == ["raw", "lang_en", "quality", "exact_dedup"]
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs"] <= a["n_docs"]
        assert b["n_chars"] <= a["n_chars"]
    assert rows[0]["retained_bp"] == 10000


def test_late_audit_bounds(spark, sf_dir):
    for r in _rows(spark, sf_dir, "events_late_arrival_audit"):
        assert 0 <= r["n_late_1h"] <= r["n_events"]
        assert 0 <= r["late_bp"] <= 10000
        assert r["max_late_us"] >= 0


def test_seasonal_backtest_mae_bounds(spark, sf_dir):
    for r in _rows(spark, sf_dir, "events_seasonal_naive_backtest"):
        assert r["sum_abs_err_cents"] >= abs(r["sum_err_cents"])
        assert r["mae_cents"] <= r["max_abs_err_cents"]


def test_pareto_cutoff_bounds(spark, sf_dir):
    for r in _rows(spark, sf_dir, "pareto_supplier_revenue"):
        assert 1 <= r["n_to_80pct"] <= r["n_suppliers"]
        assert 0 < r["top1_share_bp"] <= 10000


def test_null_safe_dominates_plain(spark, sf_dir):
    rows = _rows(spark, sf_dir, "join_null_safe_contrast")
    for r in rows:
        assert r["n_plain_hits"] <= r["n_nullsafe_hits"]
    null_rows = [r for r in rows if r["nk"] is None]
    if null_rows:  # the NULL class exists at every non-trivial SF
        assert null_rows[0]["n_plain_hits"] == 0


def test_zipf_slope_negative(spark, sf_dir):
    rows = _rows(spark, sf_dir, "text_zipf_slope")
    assert len(rows) == 1
    assert rows[0]["zipf_slope"] < 0  # frequency decreases with rank


def test_boilerplate_prefix_thresholds(spark, sf_dir):
    for r in _rows(spark, sf_dir, "text_boilerplate_prefixes"):
        assert r["n_docs"] >= 3
        assert 1 <= r["n_sources"] <= r["n_docs"]


def test_ab_test_consistency(spark, sf_dir):
    rows = _rows(spark, sf_dir, "events_ab_test_two_proportion")
    assert len(rows) == 1
    r = rows[0]
    assert r["conv_a"] <= r["n_a"] and r["conv_b"] <= r["n_b"]
    assert r["significant_95"] == (1 if abs(r["z_score"]) >= 1.96 else 0)


def test_cusum_direction_values(spark, sf_dir):
    for r in _rows(spark, sf_dir, "events_cusum_changepoint"):
        assert r["direction"] in ("shift_up", "shift_down")
        assert r["max_abs_cusum_micro"] >= 0


def test_matryoshka_retention_monotone(spark, sf_dir):
    rows = _rows(spark, sf_dir, "embedding_matryoshka_retention")
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append((r["prefix_dim"], r["mean_retained"]))
    for label, seq in by_label.items():
        seq.sort()
        vals = [v for _, v in seq]
        assert vals == sorted(vals), f"label {label}: retention not monotone in prefix"
        assert all(0 <= v <= 1.0000001 for v in vals)


def test_corrupt_audit_exact_rule(spark, sf_dir):
    for r in _rows(spark, sf_dir, "multimodal_corrupt_audit"):
        assert r["n_corrupt"] + r["n_parsed"] == r["n_payloads"]
        assert 0 <= r["corrupt_bp"] <= 10000


def test_readability_banding_consistent(spark, sf_dir):
    for r in _rows(spark, sf_dir, "text_readability_score"):
        band = "easy" if r["flesch"] >= 60 else ("medium" if r["flesch"] >= 30 else "hard")
        assert r["band"] == band


def test_gini_in_unit_interval(spark, sf_dir):
    for r in _rows(spark, sf_dir, "events_user_gini"):
        assert -0.0001 <= r["gini"] <= 1.0


def test_duplicate_payments_gap_bound(spark, sf_dir):
    for r in _rows(spark, sf_dir, "orders_duplicate_payments"):
        assert 0 <= r["gap_days"] <= 7
        assert r["first_orderkey"] != r["dup_orderkey"]


def test_bot_cadence_fields(spark, sf_dir):
    for r in _rows(spark, sf_dir, "events_bot_cadence"):
        assert r["n_gaps"] >= 5
        assert r["mean_gap_s"] >= 0
        assert r["metronomic"] in (0, 1)


def test_dau_never_exceeds_wau(spark, sf_dir):
    for r in _rows(spark, sf_dir, "events_dau_wau_stickiness"):
        assert r["dau"] <= r["wau"]
        assert 0 < r["stickiness_bp"] <= 10000


def test_surprisal_ranking_sorted(spark, sf_dir):
    rows = _rows(spark, sf_dir, "events_session_surprisal")
    vals = [r["surprisal_micro"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    for r in rows:
        assert r["per_step_micro"] * r["n_transitions"] <= r["surprisal_micro"] + r["n_transitions"]


def test_lead_time_percentile_ordering(spark, sf_dir):
    for r in _rows(spark, sf_dir, "orders_fulfillment_lead_time"):
        assert r["min_days"] <= r["p50_days"] <= r["p95_days"] <= r["max_days"]


def test_yoy_growth_null_only_first_year(spark, sf_dir):
    rows = _rows(spark, sf_dir, "revenue_yoy_growth")
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r["n_name"], []).append(r)
    for nation, seq in by_nation.items():
        assert seq[0]["yoy_growth_bp"] is None
        for r in seq[1:]:
            assert r["yoy_growth_bp"] is not None
            assert r["prev_cents"] is not None


def test_language_confusion_diagonal_semantics(spark, sf_dir):
    for r in _rows(spark, sf_dir, "text_language_confusion"):
        if r["labeled_lang"] == r["predicted_lang"]:
            assert r["n_agree"] == r["n_docs"]
        else:
            assert r["n_agree"] == 0


def test_hourly_entropy_bounds(spark, sf_dir):
    # entropy of a <=5-type mix is within [0, log2(5)] nano-units
    import math

    cap = int(math.log2(5) * 1e9) + 5  # +ulp slack from per-term rounding
    for r in _rows(spark, sf_dir, "events_hourly_entropy"):
        assert 0 <= r["entropy_nano"] <= cap
        assert r["dominant_type"]


def test_exact_duplicate_vectors_accounting(spark, sf_dir):
    rows = _rows(spark, sf_dir, "embedding_exact_duplicates")
    assert len(rows) == 1
    r = rows[0]
    assert r["n_distinct_vectors"] + r["n_redundant"] == r["n_vectors"]
    assert r["max_copies"] >= 1


def test_bitwise_popcount_matches_python(spark, sf_dir):
    for r in _rows(spark, sf_dir, "scalar_bitwise_functions"):
        assert r["popcount"] == bin(r["o_orderkey"]).count("1")
        assert r["shl3"] == r["o_orderkey"] << 3
        assert r["shr2"] == r["o_orderkey"] >> 2
