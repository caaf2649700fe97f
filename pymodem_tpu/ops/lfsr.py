"""Multiplicative (LFSR) descrambling as a GF(2) FIR convolution.

The reference descrambler (lfsr.py:22-52) is a bit-serial loop: for each
input bit b[n] (MSB first), XOR the polynomial into a shift register when
b[n] = 1, output the register's LSB, then shift right.  Unrolling that
recurrence shows the output is a *feed-forward* XOR convolution:

    out[n] = XOR_{j : poly bit j set} b[n - j]   XOR   bit n of the initial
                                                        shift register value

because the polynomial bit at position j, injected at time n, reaches the
LSB exactly j shifts later, and the seed's bit n shifts out at time n.
There is no sequential dependence at all -- the whole stream descrambles as
a handful of shifted XORs, which is the TPU-native formulation (pure VPU,
no scan).  This also makes time-block sharding trivial: the only halo is
``highest set bit of poly`` bits of the previous block.

Verified bit-exact against the reference implementation in
tests/test_primitives.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .bits import bits_to_bytes_msb, bytes_to_bits_msb, shift_right_zero_fill


def poly_tap_positions(polynomial: int) -> tuple[int, ...]:
    """Bit positions set in the polynomial (delay of each XOR tap)."""
    return tuple(j for j in range(polynomial.bit_length()) if (polynomial >> j) & 1)


def descramble_bits(bits: jax.Array, polynomial: int, seed: int = 0) -> jax.Array:
    """Descramble a {0,1} bit stream (last axis = time, MSB-first order)."""
    out = jnp.zeros_like(bits)
    for j in poly_tap_positions(polynomial):
        out = out ^ shift_right_zero_fill(bits, j)
    if seed:
        n = bits.shape[-1]
        seed_bits = np.zeros(n, dtype=np.uint8)
        for i in range(min(n, seed.bit_length())):
            seed_bits[i] = (seed >> i) & 1
        out = out ^ jnp.asarray(seed_bits)
    return out


def descramble_bytes(data: jax.Array, polynomial: int, invert: bool = False,
                     seed: int = 0) -> jax.Array:
    """Descramble a uint8 byte stream (free-running across the whole stream).

    Matches LFSR.stream_unscramble_8bit (lfsr.py:22-52): MSB-first bit order,
    shift register initialized to ``seed`` (0 for the stream stage,
    0x1F0 for IL2P block unscrambling, il2p.py:161), optional output invert.
    """
    bits = bytes_to_bits_msb(data)
    out_bits = descramble_bits(bits, polynomial, seed)
    out = bits_to_bytes_msb(out_bits)
    if invert:
        out = out ^ jnp.uint8(0xFF)
    return out


def np_descramble_bytes(data: np.ndarray, polynomial: int, invert: bool = False,
                        seed: int = 0) -> np.ndarray:
    """Host-side mirror (vectorized numpy) for tests and host codec paths."""
    bits = np.unpackbits(np.asarray(data, dtype=np.uint8))
    out = np.zeros_like(bits)
    for j in poly_tap_positions(polynomial):
        if j == 0:
            out ^= bits
        elif j < len(bits):
            out[j:] ^= bits[:-j]
    for i in range(min(len(bits), seed.bit_length())):
        out[i] ^= (seed >> i) & 1
    packed = np.packbits(out)
    if invert:
        packed ^= np.uint8(0xFF)
    return packed
