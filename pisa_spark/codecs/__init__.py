from pisa_spark.codecs.varint import varint_decode, varint_encode
from pisa_spark.codecs.varintgb import vgb_decode, vgb_encode
from pisa_spark.codecs.bitpack import bitpack_decode, bitpack_encode
from pisa_spark.codecs.eliasfano import ef_decode, ef_encode
from pisa_spark.codecs.g8iu import g8iu_decode, g8iu_encode
from pisa_spark.codecs.hybrid import hybrid_decode, hybrid_encode
from pisa_spark.codecs.interpolative import bic_decode, bic_encode
from pisa_spark.codecs.optpfor import optpfor_decode, optpfor_encode
from pisa_spark.codecs.pef import pef_decode, pef_opt_encode, pef_uniform_encode
from pisa_spark.codecs.qmx import qmx_decode, qmx_encode
from pisa_spark.codecs.rankedbitvector import (
    rbv_decode,
    rbv_encode,
    rbv_rank,
    rbv_select,
)
from pisa_spark.codecs.simple8b import s8b_decode, s8b_encode
from pisa_spark.codecs.simple16 import s16_decode, s16_encode
from pisa_spark.codecs.streamvbyte import svb_decode, svb_encode

# On-wire layout version across ALL codec families. Bump whenever any
# encoder's byte layout changes (v2: pef chunk-count header widened
# 2 -> 4 bytes). Consumers that persist encoded blocks fold this into
# their resume/commit fingerprints so an artifact written under a
# different layout re-encodes (BuildPipeline) or refuses loudly
# (IncrementalIndexer) instead of mis-decoding.
WIRE_VERSION = 2

CODECS = {
    "varint": (varint_encode, varint_decode),
    # MaskedVByte (codec/maskedvbyte.hpp) is a SIMD *decoder* for the
    # same byte-aligned varint wire format — payloads are
    # interchangeable, so the alias shares the varint functions.
    "maskedvbyte": (varint_encode, varint_decode),
    "bitpack": (bitpack_encode, bitpack_decode),
    "ef": (ef_encode, ef_decode),
    "streamvbyte": (svb_encode, svb_decode),
    "simple8b": (s8b_encode, s8b_decode),
    # 28-bit/16-mode sibling (codec/simple16.hpp): mixed-width lanes
    "simple16": (s16_encode, s16_decode),
    "varintgb": (vgb_encode, vgb_decode),
    "interpolative": (bic_encode, bic_decode),
    "optpfor": (optpfor_encode, optpfor_decode),
    "qmx": (qmx_encode, qmx_decode),
    # partitioned sequences (PEF): optimal-partition DP or uniform
    # chunks, per-chunk hybrid family choice + skip table
    "pef": (pef_opt_encode, pef_decode),
    "pef_uniform": (pef_uniform_encode, pef_decode),
    # u32-only (reference parity); u64 values raise — not for 10^12-doc
    # absolute docIDs, fine for gaps/tfs/lens
    "g8iu": (g8iu_encode, g8iu_decode),
    # compact_ranked_bitvector: bitvector + on-wire rank directory
    # (broadword rank/select point queries via rbv_rank/rbv_select);
    # dense payloads only — loud guard above RBV_MAX_UNIVERSE
    "rankedbv": (rbv_encode, rbv_decode),
    # indexed_sequence-style per-block family choice + all_ones case
    "hybrid": (hybrid_encode, hybrid_decode),
}

__all__ = [
    "CODECS",
    "bic_decode",
    "bic_encode",
    "optpfor_decode",
    "optpfor_encode",
    "pef_decode",
    "pef_opt_encode",
    "pef_uniform_encode",
    "qmx_decode",
    "qmx_encode",
    "rbv_decode",
    "rbv_encode",
    "rbv_rank",
    "rbv_select",
    "bitpack_decode",
    "bitpack_encode",
    "ef_decode",
    "ef_encode",
    "g8iu_decode",
    "g8iu_encode",
    "hybrid_decode",
    "hybrid_encode",
    "s8b_decode",
    "s8b_encode",
    "s16_decode",
    "s16_encode",
    "svb_decode",
    "svb_encode",
    "varint_decode",
    "varint_encode",
    "vgb_decode",
    "vgb_encode",
]
