"""The generated DuckDB XXH64 must reproduce Spark's xxhash64 bit-for-bit.

This is the contract that lets ``dedup_minhash_signatures_fast`` carry a
real oracle: DuckDB lacks xxhash64, so the oracle computes it in pure SQL
(``functions/xxh64_sql.py``).  Covers every code path: empty input, the
byte tail (<4), the 4-byte lane, 8-byte lanes, stripe boundaries at
31/32/33 and 95/96 bytes, multi-stripe inputs, and multibyte UTF-8.
"""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from parquet_query_spark.functions.xxh64_sql import (
    MASK56,
    spark_h12_struct_sql,
    spark_xxhash64_int1_sql,
    spark_xxhash64_sql,
)

FIXED = [
    "",
    "a",
    "abc",
    "1234567",
    "12345678",
    "123456789012",
    "hello world",
    "héllo wörld ünïcode ✓",
    "emoji 🙂 test",
    "αβγδε" * 20,
    "x" * 31,
    "y" * 32,
    "z" * 33,
    "q" * 64,
    "r" * 65,
    "s" * 95,
    "t" * 96,
    "w" * 100,
    "the quick brown fox jumps over the lazy dog",
    "\t\n mixed   ws ",
]


def _unsigned(h: int) -> int:
    return h & ((1 << 64) - 1)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _duck_hashes(con, strs):
    con.execute("CREATE OR REPLACE TABLE xt(s VARCHAR)")
    con.executemany("INSERT INTO xt VALUES (?)", [(s,) for s in strs])
    return con.execute(
        f"SELECT s, {spark_xxhash64_sql('s')} AS h1, "
        f"{spark_xxhash64_int1_sql('s')} AS h2 FROM xt"
    ).fetchall()


def _spark_hashes(spark, strs):
    df = spark.createDataFrame([(s,) for s in strs], ["s"])
    return {
        r.s: (r.h1, r.h2)
        for r in df.select(
            "s",
            F.expr("xxhash64(s)").alias("h1"),
            F.expr("xxhash64(s, 1)").alias("h2"),
        ).collect()
    }


def test_fixed_corpus_matches_spark(spark, con):
    expected = _spark_hashes(spark, FIXED)
    for s, h1, h2 in _duck_hashes(con, FIXED):
        e1, e2 = expected[s]
        assert h1 == _unsigned(e1), f"xxhash64({s!r}): duckdb {h1} != spark {e1}"
        assert h2 == _unsigned(e2), f"xxhash64({s!r},1): duckdb {h2} != spark {e2}"


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=120), min_size=1, max_size=8, unique=True))
def test_random_strings_match_spark(spark, strs):
    con = duckdb.connect()
    try:
        expected = _spark_hashes(spark, strs)
        for s, h1, h2 in _duck_hashes(con, strs):
            assert h1 == _unsigned(expected[s][0])
            assert h2 == _unsigned(expected[s][1])
    finally:
        con.close()


def test_h12_struct_matches_fast_path_masking(spark, con):
    """The oracle-side h1/h2 struct must equal the Spark fast path's
    mask-56 Carter-Wegman halves exactly."""
    rows = con.execute(
        f"SELECT s, {spark_h12_struct_sql('s')} AS h12 FROM (SELECT unnest(?) AS s)",
        [FIXED],
    ).fetchall()
    df = spark.createDataFrame([(s,) for s in FIXED], ["s"])
    expected = {
        r.s: (r.h1, r.h2)
        for r in df.select(
            "s",
            F.expr(f"xxhash64(s) & {MASK56}").alias("h1"),
            F.expr(f"(xxhash64(s, 1) & {MASK56}) * 2 + 1").alias("h2"),
        ).collect()
    }
    for s, h12 in rows:
        assert (h12["h1"], h12["h2"]) == expected[s]


def test_hash_long_matches_spark_bigints(spark, con):
    """Closed-form hashLong (the Bloom-prune probe hash) must match Spark's
    xxhash64 over BIGINT bit-for-bit, including negatives and extremes."""
    from parquet_query_spark.functions.xxh64_sql import (
        hash_long_sql,
        spark_xxhash64_long1_sql,
    )

    vals = [0, 1, 42, -1, -42, 2**62, -(2**62), 123456789012345,
            -987654321098765, 2**63 - 1, -(2**63), 7, 1500, 999999]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    expected = {
        r.x: (_unsigned(r.h), _unsigned(r.h1))
        for r in df.select(
            "x",
            F.xxhash64("x").alias("h"),
            F.xxhash64("x", F.lit(1)).alias("h1"),
        ).collect()
    }
    for v in vals:
        got = con.execute(
            f"SELECT {hash_long_sql(str(v))}, {spark_xxhash64_long1_sql(str(v))}"
        ).fetchone()
        assert (int(got[0]), int(got[1])) == expected[v], v
