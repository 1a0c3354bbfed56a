"""Property tests for dedup operators on crafted corpora.

The oracle suite proves Spark↔DuckDB agreement; these prove the operators
actually FIND duplicates: injected exact copies and near-duplicates must
surface with the right scores.
"""

import os

import pandas as pd
import pytest

from parquet_query_spark.operators.catalog import load_all

CATALOG = load_all()

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches the "
    "birds fly south for the winter and the farmer tends his field of corn"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one token changed
FAR = (
    "completely different content about spark query engines and columnar "
    "storage formats with vectorized execution and adaptive planning stages"
)


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("crafted")
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [BASE, BASE, NEAR, FAR, FAR + " extra tail words here"],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": [len(BASE), len(BASE), len(NEAR), len(FAR), len(FAR) + 22],
        }
    )
    docs.to_parquet(os.path.join(str(d), "documents.parquet"), index=False)
    return str(d)


def test_exact_dedup_finds_clones(spark, crafted_dir):
    rows = CATALOG["dedup_exact_groups"].fn(spark, crafted_dir).collect()
    by_keeper = {r.keeper_id: r.n_copies for r in rows}
    assert by_keeper[1] == 2  # docs 1+2 identical
    assert sum(by_keeper.values()) == 5


def test_exact_survivors_drop_clone(spark, crafted_dir):
    ids = [r.doc_id for r in CATALOG["dedup_exact_survivors"].fn(spark, crafted_dir).collect()]
    assert ids == [1, 3, 4, 5]  # doc 2 deduplicated away


def test_minhash_finds_near_duplicates(spark, crafted_dir):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in CATALOG["dedup_minhash_candidate_pairs"].fn(spark, crafted_dir).collect()
    }
    assert pairs[(1, 2)] == 1.0  # exact clones
    assert pairs[(1, 3)] > 0.7   # one-token perturbation
    assert (1, 4) not in pairs and (2, 4) not in pairs  # unrelated docs


def test_simhash_hamming_properties(spark, crafted_dir):
    rows = {r.doc_id: r.simhash for r in CATALOG["dedup_simhash"].fn(spark, crafted_dir).collect()}

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert rows[1] == rows[2]                 # identical text → identical hash
    assert hamming(rows[1], rows[3]) <= 12    # near-dup → close in Hamming space
    assert hamming(rows[1], rows[4]) >= 20    # unrelated → far


def test_simhash_buckets_find_near_duplicates(spark, crafted_dir):
    rows = {
        (r.doc_a, r.doc_b): r.hamming
        for r in CATALOG["dedup_simhash_buckets"].fn(spark, crafted_dir).collect()
    }
    assert rows[(1, 2)] == 0          # exact clones share every band
    assert (1, 4) not in rows         # unrelated docs never pair


def test_connected_components_chain_converges_logarithmically(spark):
    """Pointer halving must collapse a 64-node path graph in O(log n)
    rounds (plain min-label propagation needs 63)."""
    import parquet_query_spark.operators.dedup as D

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc_a INT, doc_b INT"
    )
    out = D._components_output(pairs).collect()
    assert {r.component_id for r in out} == {0}
    assert all(r.component_size == 64 for r in out)
    assert D.LAST_CC_ROUNDS <= 8, f"took {D.LAST_CC_ROUNDS} rounds"


def test_fingerprint_normalization(spark, crafted_dir):
    df = CATALOG["text_fingerprint"].fn(spark, crafted_dir)
    rows = {r.doc_id: (r.norm_fingerprint, r.raw_fingerprint) for r in df.collect()}
    assert rows[1] == rows[2]
    assert rows[1][0] != rows[3][0]


def test_simhash_python_matches_duckdb_oracle_on_random_text():
    """The mapInPandas worker and the SQL oracle must agree bit-for-bit on
    arbitrary token streams, not just the driver corpus (property check of
    the shared md5-bit signature definition, including the empty-doc and
    tie->0 rules)."""
    import duckdb
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from parquet_query_spark.operators.dedup import (
        _DUCKDB_SIMHASH_SIG_CTES,
        _simhash_batches,
    )

    token = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=8
    )
    doc = st.lists(token, min_size=0, max_size=30).map(" ".join)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=8))
    def check(texts):
        pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        py = next(_simhash_batches(iter([pdf])))
        con = duckdb.connect()
        con.register("documents", pdf)
        sql = (
            "WITH " + _DUCKDB_SIMHASH_SIG_CTES
            + " SELECT doc_id, simhash FROM sigs ORDER BY doc_id"
        )
        want = dict(con.execute(sql).fetchall())
        con.close()
        got = dict(zip(py["doc_id"], py["simhash"]))
        assert got == want

    check()


@pytest.fixture(scope="module")
def hot_band_dir(tmp_path_factory):
    """30 near-identical docs (one hot LSH band bucket: same boilerplate,
    distinct trailing token from a 3-value set, so shingle sets overlap
    ~fully and all pairs pass verification) + 4 normal docs."""
    d = tmp_path_factory.mktemp("hotband")
    texts, ids = [], []
    for i in range(30):
        texts.append(BASE + f" hotdup tail token v{i % 3}")
        ids.append(100 + i)
    texts += [FAR, FAR + " extra tail words here", NEAR, BASE]
    ids += [1, 2, 3, 4]
    docs = pd.DataFrame(
        {
            "doc_id": ids,
            "text": texts,
            "lang": ["en"] * len(ids),
            "source": ["s"] * len(ids),
            "n_chars": [len(t) for t in texts],
        }
    )
    docs.to_parquet(os.path.join(str(d), "documents.parquet"), index=False)
    return str(d)


def test_band_join_tiling_preserves_pairs(spark, hot_band_dir, monkeypatch):
    """r10 skew hardening: the chunk-tiled band self-join must emit the
    EXACT same pair set as the plain join — every pair in exactly one
    (ca ≤ cb) chunk tile.  chunk_c=7 forces the 30-doc hot bucket through
    ⌈30/7⌉ = 5 chunks → 15 tiles, exercising same-chunk and cross-chunk
    tiles plus the multi-band dropDuplicates."""
    from parquet_query_spark.operators import dedup as dd

    fn = CATALOG["dedup_minhash_candidate_pairs"].fn
    baseline = {(r.doc_a, r.doc_b): r.jaccard for r in fn(spark, hot_band_dir).collect()}
    monkeypatch.setattr(dd, "_BAND_CHUNK_C", 7)
    tiled = {(r.doc_a, r.doc_b): r.jaccard for r in fn(spark, hot_band_dir).collect()}
    assert tiled == baseline
    # the hot clique must actually be present (30 copies ≈ 435 pairs)
    hot_pairs = [p for p in tiled if p[0] >= 100 and p[1] >= 100]
    assert len(hot_pairs) == 30 * 29 // 2


def test_band_join_tiling_containment_and_pipeline_agree(spark, hot_band_dir, monkeypatch):
    """The containment and cluster-pipeline operators share the tiled
    kernel; forced multi-chunk tiling must not change their output."""
    from parquet_query_spark.operators import dedup as dd

    for name in ["dedup_minhash_containment", "dedup_cluster_pipeline"]:
        fn = CATALOG[name].fn
        base = sorted(map(tuple, fn(spark, hot_band_dir).collect()))
        monkeypatch.setattr(dd, "_BAND_CHUNK_C", 7)
        tiled = sorted(map(tuple, fn(spark, hot_band_dir).collect()))
        monkeypatch.undo()
        assert tiled == base, name
