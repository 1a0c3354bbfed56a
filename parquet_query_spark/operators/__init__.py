from parquet_query_spark.operators.catalog import CATALOG, QuerySpec, load_all, query

__all__ = ["CATALOG", "QuerySpec", "load_all", "query"]
