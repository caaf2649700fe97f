"""CRC-16 (X.25 / CRC-CCITT reflected, poly 0x8408) utilities.

The reference computes the CRC bit-serially per packet (crc_functions.py:44-55,
init 0xFFFF, final xor 0xFFFF, LSB-first) and declares a packet valid when the
carried CRC -- little-endian in the last two bytes -- exactly equals the
calculated one (the Hamming-distance threshold in CheckCRC is <= 0, i.e.
equality; crc_functions.py:56-61).

We use the standard byte-at-a-time table form, which is algebraically
identical; equivalence is asserted against the reference in tests/test_primitives.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_POLY = 0x8408


def _build_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint16)
    for byte in range(256):
        crc = byte
        for _ in range(8):
            crc = (crc >> 1) ^ _POLY if crc & 1 else crc >> 1
        table[byte] = crc
    return table


CRC_TABLE = _build_table()


def np_crc16(data: np.ndarray) -> int:
    """CRC over a byte array (host)."""
    crc = np.uint16(0xFFFF)
    table = CRC_TABLE
    for byte in np.asarray(data, dtype=np.uint8):
        crc = np.uint16(crc >> 8) ^ table[np.uint8(crc) ^ byte]
    return int(crc ^ np.uint16(0xFFFF))


def np_check_packet(data: np.ndarray) -> tuple[int, int, bool]:
    """(carried, calculated, valid) for a packet whose last two bytes carry
    the CRC little-endian (crc_functions.py:9-61)."""
    data = np.asarray(data)
    carried = int(data[-1]) * 256 + int(data[-2])
    calc = np_crc16(data[:-2])
    return carried, calc, calc == carried


def np_append_crc(data: list[int]) -> None:
    """Append CRC low byte then high byte in place (crc_functions.py:63-76)."""
    crc = np_crc16(np.asarray(data, dtype=np.uint8))
    data.append(crc & 0xFF)
    data.append(crc >> 8)


# numpy, NOT jnp: a device array built at import time leaks a tracer when
# this module is first imported inside a jit trace (e.g. the sharded codec
# step's deferred import); jnp.asarray inside the traced function is free.
_CRC_TABLE_NP = CRC_TABLE.astype(np.uint32)


def crc16_masked(data: jax.Array, length: jax.Array) -> jax.Array:
    """CRC of the first ``length`` bytes of a fixed-size buffer (device).

    data: (..., L) uint8; length: (...) int32.  Bytes at index >= length do
    not affect the result (the CRC state is only advanced while i < length),
    so padded packet buffers can be checked without compaction.
    """
    max_len = data.shape[-1]
    idx = jnp.arange(max_len, dtype=jnp.int32)
    table = jnp.asarray(_CRC_TABLE_NP)

    def step(crc, xs):
        byte, i = xs
        nxt = (crc >> 8) ^ table[(crc ^ byte.astype(jnp.uint32)) & 0xFF]
        return jnp.where(i < length, nxt, crc), None

    init = jnp.full(length.shape, 0xFFFF, dtype=jnp.uint32)
    data_t = jnp.moveaxis(data, -1, 0)
    crc, _ = jax.lax.scan(step, init, (data_t, idx))
    return crc ^ jnp.uint32(0xFFFF)
