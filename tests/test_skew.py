"""Band-skew resilience of the LSH candidate join.

A giant near-dup cluster concentrates all its docs in ONE
(band_id, band_val) shuffle bucket — at corpus scale that hot partition is
the straggler that kills naive LSH joins.  This test builds exactly that
topology and asserts AQE's skew-join optimization actually splits the hot
partition (``skew=true`` in the finalized adaptive plan) instead of
leaving one task with the whole cluster.

Thresholds are lowered because local test data is tiny; on a real cluster
the defaults (256 MB) trigger on genuinely large hot bands.
"""

import os

import pandas as pd
import pytest

from parquet_query_spark.operators.dedup import _lsh_verified_pairs

_BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
    "nu xi omicron pi rho sigma tau upsilon phi chi psi omega one two "
    "three four five six seven eight nine ten eleven twelve"
)

_SKEW_CONFS = {
    # force the joins through shuffle joins (no broadcast escape hatch)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # local-size triggers for the skew detector (defaults are 256 MB-scale)
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1024",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1024",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture()
def skewed_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skewed_docs")
    rows = []
    # one hot cluster: 500 near-identical docs -> identical band values
    for i in range(500):
        rows.append((i, f"{_BASE} hotdup tail token v{i % 7}", "en", "hot", 0))
    # cold tail: unique docs, unique bands
    for i in range(500, 1500):
        filler = " ".join(f"tok{i}x{j}" for j in range(40))
        rows.append((i, filler, "en", "cold", 0))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(os.path.join(str(d), "documents.parquet"), index=False)
    return str(d)


def test_lsh_band_join_splits_hot_band(spark, skewed_docs_dir):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        pairs = _lsh_verified_pairs(spark, skewed_docs_dir, threshold=0.2)
        rows = pairs.collect()
        # the hot cluster alone contributes ~500*499/2 verified pairs
        assert len(rows) >= 500 * 499 // 2

        plan = pairs._jdf.queryExecution().executedPlan().toString()
        # The pair explosion concentrates on doc_id keys of hot-cluster
        # members, so AQE must split those partitions in the verify joins
        # (the band join itself stays slim by design — it shuffles only
        # (doc_id, band) keys, never the shingle arrays).
        assert "skew=true" in plan, plan[:4000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
