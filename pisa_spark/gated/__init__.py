from pisa_spark.gated.sql import DIALECT_DUCKDB, DIALECT_SPARK, core_sql_entries
from pisa_spark.gated.entries import gated_queries, gated_oracle_sql

__all__ = [
    "DIALECT_DUCKDB",
    "DIALECT_SPARK",
    "core_sql_entries",
    "gated_oracle_sql",
    "gated_queries",
]
