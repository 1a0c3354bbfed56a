"""parquet_query_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dotted-ai/parquet-query (reference surveyed in
SURVEY.md), extended with LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.
"""

from parquet_query_spark.engine import Engine, Result, PREVIEW_LIMIT
from parquet_query_spark.session import get_spark, ensure_session_confs

__all__ = ["Engine", "Result", "PREVIEW_LIMIT", "get_spark", "ensure_session_confs"]
__version__ = "0.1.0"
