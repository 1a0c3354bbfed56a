"""CLI smoke: the `python -m parquet_query_spark` one-shot path, in a real
subprocess (own JVM — the one test that exercises cold start end-to-end)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_one_shot_query():
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "parquet_query_spark",
            "/root/testdata/sf0.001",
            "--table",
            "alldata",
            "-c",
            "SELECT l_returnflag, COUNT(*) AS n FROM 'lineitem.parquet' "
            "GROUP BY l_returnflag ORDER BY l_returnflag;",
        ],
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/tmp",
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "l_returnflag" in out.stdout
    assert "(3 rows)" in out.stdout
    for flag in ("A", "N", "R"):
        assert flag in out.stdout
