import os

from parquet_query_spark.engine import Engine, filter_rows, sort_rows


def test_select_42(spark):
    eng = Engine(spark=spark)
    res = eng.run("SELECT 42 AS ok;")
    assert res.columns == ["ok"]
    assert res.rows == [["42"]]
    assert res.num_rows == 1


def test_default_buffer_runs(spark):
    eng = Engine(spark=spark)
    sql = (
        "-- Dica: você pode consultar arquivos diretamente pelo caminho registrado.\n"
        "--   SELECT * FROM 'meus_dados/arquivo.parquet' LIMIT 50;\n\n"
        "SELECT 42 AS ok;"
    )
    res = eng.run(sql, cursor=len(sql))
    assert res.rows == [["42"]]


def test_open_folder_and_path_literal_scan(spark, sf_dir):
    eng = Engine.open(sf_dir, table_name="alldata", spark=spark)
    # B4: FROM 'relative/path.parquet'
    res = eng.run("SELECT COUNT(*) AS n FROM 'region.parquet'")
    assert res.rows == [["5"]]
    # sanitized per-file view
    res2 = eng.run("SELECT COUNT(*) AS n FROM region_parquet")
    assert res2.rows == [["5"]]
    # union view exists (mergeSchema union of ALL parquets in the folder)
    res3 = eng.run("SELECT COUNT(*) AS n FROM alldata")
    assert int(res3.rows[0][0]) > 0


def test_preview_limit_and_count(spark, sf_dir):
    eng = Engine.open(sf_dir, spark=spark)
    res = eng.run("SELECT * FROM 'lineitem.parquet'")
    assert len(res.rows) == 200
    assert res.num_rows > 200  # true count banner (A10)


def test_multi_statement_script(spark, sf_dir):
    eng = Engine.open(sf_dir, spark=spark)
    results = eng.run_script(
        "SELECT 1 AS a; SELECT COUNT(*) AS n FROM 'nation.parquet';"
    )
    assert [r.rows for r in results] == [[["1"]], [["25"]]]


def test_client_filter_and_sort():
    columns = ["name", "score"]
    rows = [["alpha", "2"], ["Beta", "10"], ["gamma", ""]]
    assert filter_rows(rows, "BET") == [["Beta", "10"]]
    s = sort_rows(rows, columns, "score")
    assert s == [["alpha", "2"], ["Beta", "10"], ["gamma", ""]]  # empty last
    s2 = sort_rows(rows, columns, "name", "desc")
    assert [r[0] for r in s2] == ["gamma", "Beta", "alpha"]


def test_export_csv(tmp_path, spark, sf_dir):
    eng = Engine.open(sf_dir, spark=spark)
    out = tmp_path / "out.csv"
    n = eng.export_csv("SELECT r_regionkey, r_name FROM 'region.parquet' ORDER BY r_regionkey", str(out))
    data = out.read_bytes()
    assert n == 5
    assert data.startswith(b"r_regionkey,r_name\r\n")
    assert data.count(b"\r\n") == 6


def test_events_nanos_readable(spark, sf_dir):
    from parquet_query_spark.sources.registry import load_table

    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0
