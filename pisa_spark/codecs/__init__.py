from pisa_spark.codecs.varint import varint_decode, varint_encode
from pisa_spark.codecs.bitpack import bitpack_decode, bitpack_encode
from pisa_spark.codecs.eliasfano import ef_decode, ef_encode

CODECS = {
    "varint": (varint_encode, varint_decode),
    "bitpack": (bitpack_encode, bitpack_decode),
    "ef": (ef_encode, ef_decode),
}

__all__ = [
    "CODECS",
    "bitpack_decode",
    "bitpack_encode",
    "varint_decode",
    "varint_encode",
]
