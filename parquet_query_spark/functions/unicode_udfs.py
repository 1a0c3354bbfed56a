"""Unicode normalization functions DuckDB ships but Spark lacks.

The reference forwards SQL to DuckDB (``src/duckdb.ts:46-49``), where
``nfc_normalize`` and ``strip_accents`` resolve natively.  Registered as
Arrow-batched scalar Pandas UDFs at session bootstrap, next to the
string-distance UDFs.

Semantics pinned to the bundled DuckDB 1.0.0 by probe (r9):

- ``nfc_normalize`` is Unicode NFC (``'cafe' || chr(769)`` — combining
  acute — composes to the precomposed ``'café'``); NULL → NULL.
- ``strip_accents`` is a full-Unicode NFD decomposition with every
  combining mark (category Mn) dropped — not just Latin-1: probed
  ``'ÅÉîõü日本で'`` → ``'AEiou日本て'`` (the dakuten comes off ``で``)
  and ``'Ωμέγα'`` → ``'Ωμεγα'``.  The r1–r8 engine used a curated
  Latin-1 ``translate`` (documented as intentional difference #10);
  this replaces it with the exact mapping.
"""

import unicodedata

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _nfc(s):
    return None if s is None else unicodedata.normalize("NFC", s)


def _strip_accents(s):
    if s is None:
        return None
    return "".join(
        ch
        for ch in unicodedata.normalize("NFD", s)
        if unicodedata.category(ch) != "Mn"
    )


@pandas_udf(T.StringType())
def nfc_normalize_udf(s: pd.Series) -> pd.Series:
    return s.map(_nfc)


@pandas_udf(T.StringType())
def strip_accents_udf(s: pd.Series) -> pd.Series:
    return s.map(_strip_accents)


def register_unicode_udfs(spark) -> None:
    """Idempotent registration into the session's SQL function registry."""
    spark.udf.register("nfc_normalize", nfc_normalize_udf)
    spark.udf.register("strip_accents", strip_accents_udf)
