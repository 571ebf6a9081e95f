from pisa_spark.build.ids import assign_global_ids
from pisa_spark.build.forward import tokenize_pages
from pisa_spark.build.invert import (
    build_doc_sizes,
    build_lexicon,
    build_postings,
    build_term_ids,
    collection_stats,
    lexicon_with_df,
)
from pisa_spark.build.segments import build_segments, build_term_meta, decode_segments

__all__ = [
    "assign_global_ids",
    "build_doc_sizes",
    "build_lexicon",
    "build_postings",
    "build_segments",
    "build_term_ids",
    "lexicon_with_df",
    "build_term_meta",
    "collection_stats",
    "decode_segments",
    "tokenize_pages",
]
