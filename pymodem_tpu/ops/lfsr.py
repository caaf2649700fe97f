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

from .bits import shift_right_zero_fill


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


def _seed_bytes(seed: int, n_bytes: int) -> np.ndarray:
    """MSB-first packing of the seed's shift-out bits (bit i of the seed
    leaves the register at stream time i)."""
    n_bits = min(n_bytes * 8, seed.bit_length())
    bits = np.zeros(n_bytes * 8, dtype=np.uint8)
    for i in range(n_bits):
        bits[i] = (seed >> i) & 1
    return np.packbits(bits)


def _byte_shift_right(d: jax.Array, j: int) -> jax.Array:
    """The MSB-first bit stream of ``d`` shifted right by j bits (zero
    fill), re-packed per byte -- whole-byte rolls plus one sub-byte shift,
    no 8x bit expansion."""
    bs, rs = divmod(j, 8)
    L = d.shape[-1]
    pad = [(0, 0)] * (d.ndim - 1)

    def zshift(k):
        if k == 0:
            return d
        if k >= L:
            return jnp.zeros_like(d)
        return jnp.pad(d, pad + [(k, 0)])[..., :L]

    if rs == 0:
        return zshift(bs)
    hi = zshift(bs + 1) << (8 - rs)
    lo = zshift(bs) >> rs
    return hi | lo


def descramble_bytes(data: jax.Array, polynomial: int, invert: bool = False,
                     seed: int = 0) -> jax.Array:
    """Descramble a uint8 byte stream (free-running across the whole stream).

    Matches LFSR.stream_unscramble_8bit (lfsr.py:22-52): MSB-first bit order,
    shift register initialized to ``seed`` (0 for the stream stage,
    0x1F0 for IL2P block unscrambling, il2p.py:161), optional output invert.
    Computed at byte granularity (each polynomial tap is a whole-byte roll
    plus a sub-byte shift) -- no 8x bit expansion on the hot path.
    """
    d = data.astype(jnp.uint8)
    out = jnp.zeros_like(d)
    for j in poly_tap_positions(polynomial):
        out = out ^ _byte_shift_right(d, j)
    if seed:
        sb = _seed_bytes(seed, d.shape[-1])
        pad = np.zeros(d.shape[-1], dtype=np.uint8)
        pad[: sb.shape[0]] = sb
        out = out ^ jnp.asarray(pad)
    if invert:
        out = out ^ jnp.uint8(0xFF)
    return out


def descramble_bytes_multi(data: jax.Array, polys: tuple[int, ...],
                           inverts: tuple[bool, ...],
                           chain0=None) -> jax.Array:
    """Per-chain descramble over a stacked (C_local, ..., K) uint8 stream.

    The reference driver freely mixes descrambler settings across its
    process pool (pymodem.py:140-166, lfsr.py:22-51); here each chain's
    polynomial and output invert are applied as per-chain XOR masks on the
    stacked byte stream, so chains differing only in (poly, invert) share
    one bank program.  ``polys``/``inverts`` cover the FULL bank;
    ``chain0`` (a traced scalar under shard_map, or None) selects this
    shard's window of chains.  Polynomial 0 (no stream stage) acts as the
    identity, like poly 0x1.

    Cost matches the uniform-poly path: a tap set by EVERY chain skips its
    mask entirely, so a uniform bank compiles to the same shifted XORs as
    descramble_bytes; only genuinely mixed taps pay one extra AND.
    """
    eff = tuple((p if p else 1) for p in polys)
    if all(p == 1 for p in eff) and not any(inverts):
        return data
    d = data.astype(jnp.uint8)
    c_local = d.shape[0]
    extra = (1,) * (d.ndim - 1)

    def sel(mask_np: np.ndarray) -> jax.Array:
        m = jnp.asarray(mask_np)
        if chain0 is not None:
            m = jax.lax.dynamic_slice(m, (chain0,), (c_local,))
        return m.reshape((c_local,) + extra)

    taps = sorted({j for p in eff for j in poly_tap_positions(p)})
    out = jnp.zeros_like(d)
    for j in taps:
        mask = np.array([0xFF if (p >> j) & 1 else 0 for p in eff], np.uint8)
        term = _byte_shift_right(d, j)
        out = out ^ (term if mask.all() else (term & sel(mask)))
    inv = np.array([0xFF if v else 0 for v in inverts], np.uint8)
    if inv.all():
        out = out ^ jnp.uint8(0xFF)
    elif inv.any():
        out = out ^ sel(inv)
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
