"""Byte-exact string-distance functions DuckDB ships but Spark lacks.

The reference forwards SQL to DuckDB (``src/duckdb.ts:46-49``), where
``damerau_levenshtein`` / ``jaro_similarity`` / ``jaro_winkler_similarity``
/ ``nextafter`` resolve natively; Spark has no counterparts, so they are
registered here as Arrow-batched scalar Pandas UDFs at session bootstrap
(:func:`parquet_query_spark.session.get_spark`).

Semantics are pinned to the bundled DuckDB build by probe (see
``tests/test_similarity_udfs.py``):

- distances operate on UTF-8 BYTES, not codepoints —
  ``damerau_levenshtein('café', 'cafe')`` is 2 (é is a 2-byte sequence);
- ``damerau_levenshtein`` is the FULL (unrestricted) variant:
  ``'ca' → 'abc'`` is 2, not the OSA 3;
- ``jaro_similarity`` returns 0.0 whenever either side is empty (even
  for ``('', '')``), 1.0 for equal non-empty strings;
- ``jaro_winkler_similarity`` applies the 0.1·prefix(≤4) boost only
  when the Jaro score exceeds the 0.7 threshold (probed: 0.6667 with a
  3-byte shared prefix stays unboosted);
- NULL in → NULL out for every function.

Per-pair kernels are pure Python inside an Arrow batch (one
(de)serialization per batch).  These are opt-in scalar functions for
fuzzy-dedup-style queries, not hot-path primitives — the engine's
bulk dedup tiers (MinHash/SimHash banding) stay in native Spark
expressions.
"""

from pyspark.sql import types as T

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def _dl_bytes(a: bytes, b: bytes) -> int:
    """Full Damerau-Levenshtein (unrestricted transpositions)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxdist = la + lb
    da: dict[int, int] = {}
    h = [[0] * (lb + 2) for _ in range(la + 2)]
    h[0][0] = maxdist
    for i in range(la + 1):
        h[i + 1][0] = maxdist
        h[i + 1][1] = i
    for j in range(lb + 1):
        h[0][j + 1] = maxdist
        h[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            h[i + 1][j + 1] = min(
                h[i][j] + cost,
                h[i + 1][j] + 1,
                h[i][j + 1] + 1,
                h[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return h[la + 1][lb + 1]


def _jaro_bytes(s1: bytes, s2: bytes) -> float:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    match_dist = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i in range(l1):
        lo = max(0, i - match_dist)
        hi = min(l2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(l1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    return (
        matches / l1 + matches / l2 + (matches - t) / matches
    ) / 3.0


def _jaro_winkler_bytes(s1: bytes, s2: bytes) -> float:
    jaro = _jaro_bytes(s1, s2)
    if jaro <= 0.7:  # boost threshold — probed: 0.6667 stays unboosted
        return jaro
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix += 1
    return jaro + 0.1 * prefix * (1.0 - jaro)


def _pairwise(fn, a: pd.Series, b: pd.Series, out_dtype):
    out = []
    for x, y in zip(a, b):
        if x is None or y is None or x is pd.NA or y is pd.NA:
            out.append(None)
        else:
            out.append(fn(str(x).encode("utf-8"), str(y).encode("utf-8")))
    return pd.Series(out, dtype=out_dtype)


@pandas_udf(T.LongType())
def damerau_levenshtein_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return _pairwise(_dl_bytes, a, b, "Int64")


@pandas_udf(T.DoubleType())
def jaro_similarity_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return _pairwise(_jaro_bytes, a, b, "float64")


@pandas_udf(T.DoubleType())
def jaro_winkler_similarity_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return _pairwise(_jaro_winkler_bytes, a, b, "float64")


@pandas_udf(T.DoubleType())
def nextafter_udf(x: pd.Series, y: pd.Series) -> pd.Series:
    xv = x.astype("float64")
    yv = y.astype("float64")
    res = np.nextafter(xv.to_numpy(), yv.to_numpy())
    out = pd.Series(res, index=x.index)
    out[x.isna() | y.isna()] = None
    return out


def register_similarity_udfs(spark) -> None:
    """Idempotent registration into the session's SQL function registry."""
    spark.udf.register("damerau_levenshtein", damerau_levenshtein_udf)
    spark.udf.register("jaro_similarity", jaro_similarity_udf)
    spark.udf.register("jaro_winkler_similarity", jaro_winkler_similarity_udf)
    spark.udf.register("nextafter", nextafter_udf)
