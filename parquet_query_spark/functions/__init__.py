"""Reusable column functions (cosine, norms, shingles) live with their
operators for now; this package is the future home of a DuckDB↔Spark
function-name compat shim if the oracle surfaces dialect deltas."""
