"""Format dispatch + folder import fixtures (FIXTURES.md §2, operators A1-A5).

One logical table written in all four admitted encodings plus a .txt decoy;
the folder import must register the four and skip the decoy, and the union
view must merge multiple parquet files with schema evolution.
"""

import json
import os

import pytest

from parquet_query_spark.engine import Engine
from parquet_query_spark.sources.registry import collect_files, is_supported_file_path


ROWS = [
    {"id": 1, "name": "plain", "score": 1.5, "active": True, "note": "a"},
    {"id": 2, "name": 'quo"te, comma', "score": -2.25, "active": False, "note": None},
    {"id": 3, "name": "línea\nnova", "score": 0.0, "active": True, "note": "c"},
]


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("formats")
    import pandas as pd

    pdf = pd.DataFrame(ROWS)
    pdf.to_parquet(d / "t.parquet", index=False)
    pdf.to_csv(d / "t.csv", index=False)
    (d / "t.json").write_text(json.dumps(ROWS))
    (d / "t.ndjson").write_text("\n".join(json.dumps(r) for r in ROWS))
    (d / "decoy.txt").write_text("not data")
    sub = d / "more"
    sub.mkdir()
    pd.DataFrame(
        [{"id": 4, "name": "extra", "score": 9.0, "active": False, "note": "d", "extra_col": 7}]
    ).to_parquet(sub / "t2.parquet", index=False)
    return str(d)


def test_is_supported_file_path():
    assert is_supported_file_path("a/b.PARQUET")
    assert is_supported_file_path("x.ndjson")
    assert not is_supported_file_path("x.txt")
    assert not is_supported_file_path("x.parquet.bak")


def test_collect_files_recurses_and_filters(fixture_dir):
    files = [f.path for f in collect_files(fixture_dir)]
    # os.walk yields the root's files first, then subdirectories
    assert files == ["t.csv", "t.json", "t.ndjson", "t.parquet", "more/t2.parquet"]


def test_each_format_readable(spark, fixture_dir):
    eng = Engine.open(fixture_dir, spark=spark)
    for path in ["t.parquet", "t.csv", "t.json", "t.ndjson"]:
        res = eng.run(f"SELECT count(*) AS n FROM '{path}'")
        assert res.rows == [["3"]], path


def test_json_array_and_ndjson_agree(spark, fixture_dir):
    eng = Engine.open(fixture_dir, spark=spark)
    a = eng.run("SELECT id, name FROM 't.json' ORDER BY id").rows
    b = eng.run("SELECT id, name FROM 't.ndjson' ORDER BY id").rows
    assert a == b


def test_union_view_merges_schema(spark, fixture_dir):
    eng = Engine.open(fixture_dir, table_name="unioned", spark=spark)
    res = eng.run("SELECT count(*) AS n, count(extra_col) AS with_extra FROM unioned")
    # 3 rows from t.parquet (extra_col null) + 1 from more/t2.parquet
    assert res.rows == [["4", "1"]]


def test_empty_buffer_raises_clean_error(spark):
    eng = Engine(spark=spark)
    with pytest.raises(ValueError, match="no SQL statement"):
        eng.run("   -- only a comment\n")


def test_restage_fixes_fat_row_groups(spark, tmp_path):
    """A file with a few fat row groups must be restaged so scan-side
    compute parallelizes (the 64x regression: 3 row groups -> 3 of 32
    cores -> minhash signatures 149s instead of 13s)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_query_spark.sources.registry import _needs_restage, load_table

    n = 30_000
    tbl = pa.table({"doc_id": list(range(n)), "text": ["word " * 10] * n})
    path = tmp_path / "documents.parquet"
    pq.write_table(tbl, path, row_group_size=n // 3 + 1)  # 3 fat groups
    assert pq.ParquetFile(path).metadata.num_row_groups <= 3
    assert _needs_restage(str(path))
    df = load_table(spark, str(tmp_path), "documents")
    assert df.rdd.getNumPartitions() >= 16
    assert df.count() == n


def test_tiny_tables_not_restaged(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_query_spark.sources.registry import _needs_restage

    tbl = pa.table({"k": [1, 2, 3]})
    path = tmp_path / "region.parquet"
    pq.write_table(tbl, path)
    assert not _needs_restage(str(path))
