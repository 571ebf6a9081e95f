from pisa_spark.codecs.varint import varint_decode, varint_encode
from pisa_spark.codecs.bitpack import bitpack_decode, bitpack_encode

CODECS = {
    "varint": (varint_encode, varint_decode),
    "bitpack": (bitpack_encode, bitpack_decode),
}

__all__ = [
    "CODECS",
    "bitpack_decode",
    "bitpack_encode",
    "varint_decode",
    "varint_encode",
]
