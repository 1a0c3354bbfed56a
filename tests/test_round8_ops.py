"""Semantic checks for the round-8 operators — invariants the oracle
hash-compare can't express (bounds, conservation, epoch-variance).
Oracle value-parity itself is covered by test_oracle_parity.py's
parametrized sweep."""

import math

import pytest


@pytest.fixture(scope="module")
def catalog():
    from parquet_query_spark.operators.catalog import load_all

    return load_all()


@pytest.fixture(scope="module")
def spark():
    from parquet_query_spark.session import get_spark

    return get_spark("test-round8")


SF = "/root/testdata/sf0.01"


def test_twonn_estimates_are_positive_finite(catalog, spark):
    rows = catalog["embedding_intrinsic_dim_twonn"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_points"] > 0
        # ln(d2/d1) >= 0 termwise (d2 >= d1 by rank), so the sum is too
        assert r["sum_log_ratio"] >= 0
        if r["intrinsic_dim"] is not None:
            assert r["intrinsic_dim"] > 0
            assert math.isfinite(r["intrinsic_dim"])


def test_hubness_conserves_vectors_and_hits(catalog, spark):
    from parquet_query_spark.operators.catalog import views

    rows = catalog["embedding_hubness_kocc"].fn(spark, SF).collect()
    n_vecs = views(spark, SF)["embeddings"].count()
    assert sum(r["n_vectors"] for r in rows) == n_vecs
    for r in rows:
        assert 0 <= r["n_antihubs"] <= r["n_vectors"]
        assert r["avg_kocc"] >= 0
        assert r["max_kocc"] >= r["avg_kocc"]
    # total k-occurrences = 5 slots per sampled query
    total_hits = sum(round(r["avg_kocc"] * r["n_vectors"]) for r in rows)
    n_queries = (
        views(spark, SF)["embeddings"].where("vec_id % 10 = 0").count()
    )
    assert total_hits == 5 * n_queries


def test_kl_drift_nonnegative_and_daily(catalog, spark):
    rows = catalog["events_kl_drift_daily"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        # KL divergence is non-negative (Gibbs); -0.0 can survive rounding
        assert r["kl_nats"] >= -1e-12
    days = [r["day"] for r in rows]
    assert len(set(days)) == len(days)


def test_length_bands_partition_each_source(catalog, spark):
    from parquet_query_spark.operators.catalog import views

    rows = catalog["docs_length_band_profile"].fn(spark, SF).collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r)
    docs = views(spark, SF)["documents"]
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    for source, band_rows in per_source.items():
        assert [r["band"] for r in sorted(band_rows, key=lambda r: r["band"])] == list(
            range(1, len(band_rows) + 1)
        )
        assert sum(r["n_docs"] for r in band_rows) == counts[source]
        # bands are ordered by length: min_chars non-decreasing
        ordered = sorted(band_rows, key=lambda r: r["band"])
        for a, b in zip(ordered, ordered[1:]):
            assert a["min_chars"] <= b["min_chars"]
            assert a["max_chars"] <= b["max_chars"]


def test_annealing_mix_spends_the_budget(catalog, spark):
    rows = catalog["pipeline_annealing_mix"].fn(spark, SF).collect()
    assert rows
    p1 = sum(r["phase1_tokens"] for r in rows)
    p2 = sum(r["phase2_tokens"] for r in rows)
    # per-source rounding drifts at most half a token per source
    assert abs(p1 - 900_000) <= len(rows)
    assert abs(p2 - 100_000) <= len(rows)
    for r in rows:
        assert 0 <= r["frac_long"] <= 1
        assert r["phase2_epochs"] > 0


def test_epoch_shuffle_varies_by_epoch_and_conserves_docs(catalog, spark):
    from parquet_query_spark.operators.catalog import views

    rows = catalog["pipeline_epoch_shuffle_blocks"].fn(spark, SF).collect()
    n_docs = views(spark, SF)["documents"].count()
    per_epoch = {}
    for r in rows:
        per_epoch.setdefault(r["epoch"], []).append(r)
    assert sorted(per_epoch) == [0, 1, 2]
    checksums = {}
    for epoch, shard_rows in per_epoch.items():
        assert sum(r["n_docs"] for r in shard_rows) == n_docs
        checksums[epoch] = tuple(
            r["order_checksum"] for r in sorted(shard_rows, key=lambda r: r["shard"])
        )
    # the permutation must actually change between epochs
    assert checksums[0] != checksums[1]
    assert checksums[1] != checksums[2]


def test_burstiness_bounds(catalog, spark):
    rows = catalog["text_term_burstiness"].fn(spark, SF).collect()
    assert len(rows) == 20
    cfs = [r["cf"] for r in rows]
    assert cfs == sorted(cfs, reverse=True)
    for r in rows:
        assert r["df"] <= r["cf"]
        assert r["burstiness"] >= 1.0
        # Poisson expectation never exceeds cf and never undershoots a
        # uniform spread less than df can achieve... it CAN be below df
        # (that's burstiness < expected); just bound it by the corpus
        assert 0 < r["poisson_df"] <= r["cf"]


def test_km_survival_monotone_and_bounded(catalog, spark):
    rows = catalog["customers_repeat_survival_km"].fn(spark, SF).collect()
    assert rows
    per_seg = {}
    for r in rows:
        per_seg.setdefault(r["segment"], []).append(r)
    for seg, seg_rows in per_seg.items():
        seg_rows.sort(key=lambda r: r["t_weeks"])
        assert [r["t_weeks"] for r in seg_rows] == list(range(4, 53, 4))
        surv = [r["survival"] for r in seg_rows]
        ev = [r["cum_events"] for r in seg_rows]
        assert all(0.0 <= s <= 1.0 for s in surv)
        # survival non-increasing, events non-decreasing in t
        assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))
        assert all(a <= b for a, b in zip(ev, ev[1:]))


def test_lpa_communities_partition_nodes(catalog, spark):
    rows = catalog["neardup_label_propagation"].fn(spark, SF).collect()
    assert rows
    sizes = [r["size"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    assert all(s >= 1 for s in sizes)
    # labels are node ids, hence distinct communities
    assert len({r["community"] for r in rows}) == len(rows)


def test_markov_entropy_rate_bounds(catalog, spark):
    import math

    rows = catalog["events_markov_entropy_rate"].fn(spark, SF).collect()
    assert rows
    max_h = math.log2(len(rows))  # <= log2(#states) with a square matrix
    total_share = sum(r["stationary_share"] for r in rows)
    assert abs(total_share - 1.0) < 0.01
    for r in rows:
        assert 0.0 <= r["cond_entropy_bits"] <= max_h + 1e-9
        assert r["rate_contrib_bits"] <= r["cond_entropy_bits"] + 1e-9


def test_silhouette_bounds_and_membership(catalog, spark):
    from parquet_query_spark.operators.catalog import views

    rows = catalog["embedding_kmeans_silhouette"].fn(spark, SF).collect()
    assert rows
    n_vecs = views(spark, SF)["embeddings"].count()
    assert sum(r["n_members"] for r in rows) == n_vecs
    for r in rows:
        assert -1.0 <= r["worst_silhouette"] <= r["mean_silhouette"] <= 1.0


def test_silhouette_clusters_match_kmeans(catalog, spark):
    km = catalog["kmeans_embeddings"].fn(spark, SF).collect()
    sizes = {}
    for r in km:
        sizes[r["cluster"]] = sizes.get(r["cluster"], 0) + 1
    sil = catalog["embedding_kmeans_silhouette"].fn(spark, SF).collect()
    assert {r["cluster"]: r["n_members"] for r in sil} == sizes


def test_rfm_migration_conserves_customers(catalog, spark):
    from parquet_query_spark.operators.catalog import views

    rows = catalog["orders_rfm_migration"].fn(spark, SF).collect()
    active = (
        views(spark, SF)["orders"].select("o_custkey").distinct().count()
    )
    # every active customer lands in exactly one matrix cell
    assert sum(r["n_customers"] for r in rows) == active
    for r in rows:
        assert 0 <= r["m_score_h1"] <= 5 and 0 <= r["m_score_h2"] <= 5
        # (0, 0) is impossible: a customer absent from both halves has no orders
        assert (r["m_score_h1"], r["m_score_h2"]) != (0, 0)
