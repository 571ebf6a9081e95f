from pisa_spark.functions.scoring import (
    bm25_score_np,
    bm25_sql_expr,
    dph_score_np,
    pl2_score_np,
    qld_score_np,
)

__all__ = [
    "bm25_score_np",
    "bm25_sql_expr",
    "dph_score_np",
    "pl2_score_np",
    "qld_score_np",
]
