from pisa_spark.query.kernels import (
    TermPostings,
    and_kernel,
    block_max_wand_kernel,
    maxscore_kernel,
    or_kernel,
    ranked_and_kernel,
    ranked_or_kernel,
    wand_kernel,
)

__all__ = [
    "TermPostings",
    "and_kernel",
    "block_max_wand_kernel",
    "maxscore_kernel",
    "or_kernel",
    "ranked_and_kernel",
    "ranked_or_kernel",
    "wand_kernel",
]
