from parquet_query_spark.workbench.statements import (
    split_statements,
    statement_at_position,
    rewrite_path_tables,
)
from parquet_query_spark.workbench.quoting import (
    sql_string_literal,
    sql_identifier,
    spark_identifier,
)
from parquet_query_spark.workbench.formatting import format_cell, bytes_human
from parquet_query_spark.workbench.csv_sink import (
    csv_escape,
    csv_line,
    rows_to_csv_parts,
)

__all__ = [
    "split_statements",
    "statement_at_position",
    "rewrite_path_tables",
    "sql_string_literal",
    "sql_identifier",
    "spark_identifier",
    "format_cell",
    "bytes_human",
    "csv_escape",
    "csv_line",
    "rows_to_csv_parts",
]
