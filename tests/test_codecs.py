"""Codec round-trip tests, mirroring reference test/test_block_codecs.cpp:18-57
(sizes {1, 16, block_size-1, block_size}, random values, fixed seed)."""

import numpy as np
import pytest

from pisa_spark.codecs import CODECS

SIZES = [1, 2, 16, 127, 128, 129, 1000]


@pytest.mark.parametrize("codec", list(CODECS))
@pytest.mark.parametrize("n", SIZES)
def test_roundtrip_random(codec, n):
    enc, dec = CODECS[codec]
    rng = np.random.default_rng(42 + n)
    vals = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    out = dec(enc(vals), n)
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("codec", list(CODECS))
def test_roundtrip_edge_values(codec):
    enc, dec = CODECS[codec]
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**28, 2**32 - 1],
                    dtype=np.uint32)
    np.testing.assert_array_equal(dec(enc(vals), len(vals)), vals)


@pytest.mark.parametrize("codec", list(CODECS))
def test_roundtrip_zeros_and_small(codec):
    enc, dec = CODECS[codec]
    vals = np.zeros(128, dtype=np.uint32)
    np.testing.assert_array_equal(dec(enc(vals), 128), vals)
    vals = np.ones(128, dtype=np.uint32)
    np.testing.assert_array_equal(dec(enc(vals), 128), vals)


@pytest.mark.parametrize("codec", list(CODECS))
def test_empty(codec):
    enc, dec = CODECS[codec]
    assert enc(np.empty(0, dtype=np.uint32)) == b""
    assert dec(b"", 0).size == 0


def test_varint_wire_format():
    # MSB-terminator layout parity with TightVariableByte
    # (block_codecs.hpp:19-123): last byte of each value has bit 7 set.
    from pisa_spark.codecs import varint_encode

    assert varint_encode(np.array([0], dtype=np.uint32)) == bytes([0x80])
    assert varint_encode(np.array([127], dtype=np.uint32)) == bytes([0xFF])
    # 128 = 0b1000_0000 -> chunks [0, 1] -> bytes [0x00, 0x81]
    assert varint_encode(np.array([128], dtype=np.uint32)) == bytes([0x00, 0x81])


@pytest.mark.parametrize("codec", list(CODECS))
def test_roundtrip_u64(codec):
    enc, dec = CODECS[codec]
    vals = np.array([0, 2**32, 2**40 + 7, 2**63 - 1, 10**12], dtype=np.uint64)
    np.testing.assert_array_equal(dec(enc(vals), len(vals)), vals)
