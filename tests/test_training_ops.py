"""Behavior tests for the round-3 training-pipeline operators on crafted
corpora: repetition stats, cross-corpus span flagging, sequence packing,
k-means, SemDeDup pruning, and the event funnel.

The oracle suite proves Spark↔DuckDB agreement; these prove the operators
compute the RIGHT thing on inputs with known answers.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_query_spark.operators.catalog import load_all

CATALOG = load_all()

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches the "
    "birds fly south for the winter and the farmer tends his field of corn"
)
FAR = (
    "completely different content about spark query engines and columnar "
    "storage formats with vectorized execution and adaptive planning stages"
)


@pytest.fixture(scope="module")
def text_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("training_text")
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a a a a a a a a a a", BASE, BASE, FAR],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [19, len(BASE), len(BASE), len(FAR)],
        }
    )
    docs.to_parquet(os.path.join(str(d), "documents.parquet"), index=False)
    return str(d)


def test_repetition_stats_flag_degenerate_doc(spark, text_dir):
    rows = {r.doc_id: r for r in CATALOG["text_repetition_stats"].fn(spark, text_dir).collect()}
    # doc 1 is one word x10: every 2-gram is "a a" (9 of them, 1 distinct)
    assert rows[1].n_2grams == 9
    assert rows[1].top_2gram_frac == 1.0
    assert rows[1].dup_2gram_frac == round(8 / 9, 4)
    # natural text: top 2-gram far below 1
    assert rows[2].top_2gram_frac < 0.3
    assert rows[2].n_5grams == len(BASE.split()) - 4


def test_common_spans_flag_cross_doc_copies(spark, text_dir):
    rows = {r.doc_id: r for r in CATALOG["dedup_common_spans"].fn(spark, text_dir).collect()}
    # docs 2+3 identical -> every 5-gram shared -> flagged
    assert rows[2].common_span_frac == 1.0 and rows[2].flagged == 1
    assert rows[3].common_span_frac == 1.0 and rows[3].flagged == 1
    # FAR shares no 5-gram with anything
    assert rows[4].n_common_5grams == 0 and rows[4].flagged == 0


def test_pack_sequences_conserves_tokens(spark, text_dir):
    out = CATALOG["pipeline_pack_sequences"].fn(spark, text_dir).collect()
    total_packed = sum(r.n_tokens for r in out)
    total_tokens = 10 + 2 * len(BASE.split()) + len(FAR.split())
    assert total_packed == total_tokens
    # bins are dense 0..max per lang and uniquely keyed
    bins = sorted(r.bin_id for r in out)
    assert bins == list(range(len(bins)))


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    """10 one-hot float32 vectors; vec 8 duplicates vec 2 exactly."""
    d = tmp_path_factory.mktemp("training_emb")
    vecs = []
    for i in range(10):
        v = np.zeros(64, dtype=np.float32)
        v[i if i != 8 else 2] = 1.0
        vecs.append(v.tolist())
    t = pa.table(
        {
            "vec_id": pa.array(range(10), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * 10, pa.int32()),
        }
    )
    pq.write_table(t, os.path.join(str(d), "embeddings.parquet"))
    return str(d)


def test_kmeans_assigns_every_vector_once(spark, emb_dir):
    rows = CATALOG["kmeans_embeddings"].fn(spark, emb_dir).collect()
    assert len(rows) == 10
    assert {r.vec_id for r in rows} == set(range(10))
    assert all(0 <= r.cluster < 8 for r in rows)
    # the exact duplicate lands in its twin's cluster at distance 0
    by_id = {r.vec_id: r for r in rows}
    assert by_id[8].cluster == by_id[2].cluster
    assert by_id[8].dist2 == by_id[2].dist2


def test_semdedup_drops_exact_twin_keeps_rest(spark, emb_dir):
    survivors = {r.vec_id for r in CATALOG["semdedup_prune"].fn(spark, emb_dir).collect()}
    assert 8 not in survivors  # cosine(vec2, vec8) = 1 >= tau, higher id drops
    assert survivors == set(range(10)) - {8}


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("training_events")
    ts = pd.to_datetime(
        [
            "2026-01-01 10:00", "2026-01-01 10:05", "2026-01-01 10:10",  # u1 full funnel
            "2026-01-01 11:00",                                            # u2 view only
            "2026-01-01 12:00", "2026-01-01 12:05",                        # u3 click BEFORE view
        ]
    )
    ev = pd.DataFrame(
        {
            "event_id": range(6),
            "ts": ts,
            "user_id": [1, 1, 1, 2, 3, 3],
            "event_type": ["view", "click", "purchase", "view", "click", "view"],
            "value": [1.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    ev.to_parquet(os.path.join(str(d), "events.parquet"), index=False)
    return str(d)


def test_funnel_orders_stages_strictly(spark, events_dir):
    rows = {r.stage_name: r for r in CATALOG["events_funnel"].fn(spark, events_dir).collect()}
    assert rows["view"].n_users == 3
    # only u1 clicked AFTER first view (u3's click precedes their view)
    assert rows["click_after_view"].n_users == 1
    assert rows["purchase_after_click"].n_users == 1
    assert rows["click_after_view"].conversion == round(1 / 3, 4)


@pytest.fixture(scope="module")
def mix_dir(tmp_path_factory):
    """Two sources: 'big' has 4 docs x 25 tokens, 'small' 1 doc x 25."""
    d = tmp_path_factory.mktemp("training_mix")
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [" ".join(["w%d" % i] * 25) for i in range(5)],
            "lang": ["en"] * 5,
            "source": ["big", "big", "big", "big", "small"],
            "n_chars": [75] * 5,
        }
    )
    docs.to_parquet(os.path.join(str(d), "documents.parquet"), index=False)
    return str(d)


def test_source_mixing_upsamples_small_source(spark, mix_dir):
    rows = {r.source: r for r in CATALOG["pipeline_source_mixing"].fn(spark, mix_dir).collect()}
    assert rows["big"].n_tokens == 100 and rows["small"].n_tokens == 25
    assert rows["big"].natural_share == 0.8
    # sqrt temperature: weights 10:5 -> 2/3 vs 1/3
    assert rows["big"].mix_weight == round(2 / 3, 6)
    assert rows["small"].mix_weight == round(1 / 3, 6)
    # the small source is upsampled past one epoch, the big one below
    assert rows["small"].epochs > 1 > rows["big"].epochs


def test_unigram_lm_score_orders_repetitive_below_rare(spark, text_dir):
    rows = {r.doc_id: r for r in CATALOG["text_unigram_lm_score"].fn(spark, text_dir).collect()}
    # doc 1 ("a" x10) is dominated by one frequent token -> lowest entropy
    assert rows[1].bits_per_token == min(r.bits_per_token for r in rows.values())
    assert rows[1].quality_bucket == "low_entropy"
    # identical docs 2 and 3 score identically
    assert rows[2].bits_per_token == rows[3].bits_per_token


@pytest.fixture(scope="module")
def pii_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("training_pii")
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "contact alice@example.com or bob.smith@mail.co, card 4111222233334444 ext 12",
                "nothing sensitive here just words",
            ],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [80, 33],
        }
    )
    docs.to_parquet(os.path.join(str(d), "documents.parquet"), index=False)
    return str(d)


def test_pii_redact_counts_and_scrubs(spark, pii_dir):
    rows = {r.doc_id: r for r in CATALOG["text_pii_redact"].fn(spark, pii_dir).collect()}
    assert rows[1].n_emails == 2
    assert rows[1].n_longnums == 1  # "12" is below the 4-digit floor
    assert rows[1].was_redacted == 1
    assert rows[2].was_redacted == 0
    import hashlib
    expect = "contact <EMAIL> or <EMAIL>, card <NUM> ext 12"
    assert rows[1].redacted_hash == hashlib.md5(expect.encode()).hexdigest()


def test_vocab_top_pairs_finds_dominant_bigram(spark, text_dir):
    rows = CATALOG["vocab_top_pairs"].fn(spark, text_dir).collect()
    # doc 1 contributes 9 copies of "a a" -- nothing else repeats that much
    assert rows[0].pair == "a a" and rows[0].c == 9
    # strictly ordered by (c desc, pair asc)
    keys = [(-r.c, r.pair) for r in rows]
    assert keys == sorted(keys)


def test_pack_sequences_spec_invariants_on_random_corpora():
    """The packing SPEC (as written in the oracle SQL — parity ties Spark to
    it) must conserve tokens, produce dense bin ids, and only exceed the
    256-token budget by a straddling chunk (<32 tokens), on arbitrary
    corpora — not just the driver tables."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    oracle = CATALOG["pipeline_pack_sequences"].oracle

    word = st.text(alphabet="abcdef", min_size=1, max_size=4)
    doc = st.lists(word, min_size=1, max_size=90).map(" ".join)

    @settings(max_examples=20, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=12), st.sampled_from(["en", "de"]))
    def check(texts, lang2):
        langs = ["en" if i % 2 else lang2 for i in range(len(texts))]
        pdf = pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "lang": langs,
                "source": ["s"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        )
        con = duckdb.connect()
        con.register("documents", pdf)
        rows = con.execute(oracle).fetchall()
        con.close()
        # (lang, bin_id, n_chunks, n_tokens, fill_ratio, bin_hash)
        total = sum(r[3] for r in rows)
        expect = sum(len(t.split()) for t in texts)
        assert total == expect  # token conservation
        for lg in set(langs):
            bins = sorted(r[1] for r in rows if r[0] == lg)
            assert bins == list(range(len(bins)))  # dense per-lang bin ids
        for r in rows:
            assert r[3] <= 256 + 31  # budget + max straddle
            assert r[2] >= 1

    check()
