"""Guard against silent dict-literal key shadowing in the dialect layer.

Round 8 shipped a second ``"product"`` key inside the ``_FN_MACROS``
literal (``_strip_agg_order("product")``) that silently clobbered the
``_macro_product`` expansion registered 90 lines earlier — Python dict
literals keep the LAST duplicate key, so plain ``product(x)`` reached
Spark unexpanded and raised UNRESOLVED_ROUTINE.  This test AST-scans
every module in the workbench package for dict literals with duplicate
string keys (identical-value duplicates are just as banned: they are
one edit away from becoming a shadow) so the failure mode is loud at
test time instead of at query time.
"""

from __future__ import annotations

import ast
import pathlib

import pytest

_PKG = pathlib.Path(__file__).resolve().parents[1] / "parquet_query_spark"


def _dict_dupes(path: pathlib.Path):
    tree = ast.parse(path.read_text(), filename=str(path))
    dupes = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Dict):
            continue
        seen: dict[str, str] = {}
        for k, v in zip(node.keys, node.values):
            if k is None or not isinstance(k, ast.Constant):
                continue  # **spread or computed key — not a literal entry
            if not isinstance(k.value, str):
                continue
            key = k.value
            val_src = ast.unparse(v)
            if key in seen:
                dupes.append(
                    f"{path.name}:{k.lineno} duplicate dict key {key!r} "
                    f"(earlier value {seen[key]!r}, later value {val_src!r})"
                )
            else:
                seen[key] = val_src
    return dupes


@pytest.mark.parametrize(
    "path",
    sorted(_PKG.rglob("*.py")),
    ids=lambda p: str(p.relative_to(_PKG)),
)
def test_no_duplicate_dict_keys(path):
    dupes = _dict_dupes(path)
    assert not dupes, "\n".join(dupes)


def test_product_expands():
    """product() both plain and with an in-call ORDER BY — the exact
    shapes the r8 shadowing broke."""
    from parquet_query_spark.engine import Engine

    eng = Engine.open("/root/testdata/sf0.001")
    rows = eng.sql(
        "SELECT product(x) AS p, product(x ORDER BY x DESC) AS po "
        "FROM (VALUES (2.0), (3.0), (-4.0)) AS t(x)"
    ).collect()
    assert abs(rows[0]["p"] - (-24.0)) < 1e-9
    assert abs(rows[0]["po"] - (-24.0)) < 1e-9
