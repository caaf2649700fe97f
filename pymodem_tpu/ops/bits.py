"""Bit/byte packing utilities (device-side)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bytes_to_bits_msb(data: jax.Array) -> jax.Array:
    """(..., K) uint8 -> (..., K*8) {0,1} uint8, MSB first within each byte."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (data[..., :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8)


def bits_to_bytes_msb(bits: jax.Array) -> jax.Array:
    """(..., K*8) {0,1} -> (..., K) uint8, MSB first within each byte."""
    k8 = bits.shape[-1]
    grouped = bits.reshape(*bits.shape[:-1], k8 // 8, 8).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(7, -1, -1, dtype=jnp.uint8))
    return jnp.sum(grouped * weights, axis=-1, dtype=jnp.uint8)


def shift_right_zero_fill(bits: jax.Array, k: int) -> jax.Array:
    """Delay a bit stream by k positions along the last axis, zero filling."""
    if k == 0:
        return bits
    pad = [(0, 0)] * (bits.ndim - 1) + [(k, 0)]
    return jnp.pad(bits, pad)[..., : bits.shape[-1]]


def take_rows_shifted(rows: jax.Array, shift: jax.Array,
                      width: int) -> jax.Array:
    """out[r, i] = rows[r, shift[r] + i] for i < width (zero fill past the
    row's end).

    A vmapped ``dynamic_slice`` here costs ~3 us/row on TPU (per-row DMA
    descriptor overhead); this instead decomposes the per-row shift into
    log2(W0) STATIC whole-array rolls, each selected per row by one bit of
    the shift -- pure copy-speed concatenates and selects (the same
    binary-decomposition trick as ops/crc.py's exponent unwind).

    rows: (R, W0); shift: (R,) int32 in [0, W0].
    """
    R, W0 = rows.shape
    n = W0 + width  # slack so wrap-around never reaches [0, width)
    r = jnp.pad(rows, ((0, 0), (0, n - W0)))
    s = jnp.clip(shift, 0, W0).astype(jnp.int32)
    for k in range(max(int(W0).bit_length(), 1)):
        sh = 1 << k
        rolled = jnp.concatenate([r[:, sh:], r[:, :sh]], axis=1)
        r = jnp.where(((s >> k) & 1)[:, None] == 1, rolled, r)
    return r[:, :width]


def place_rows_shifted(rows: jax.Array, shift: jax.Array,
                       width: int) -> jax.Array:
    """out[r, shift[r] + j] = rows[r, j] (the inverse of take_rows_shifted):
    place each row at its offset in a ``width``-wide zero buffer via static
    binary-decomposition rolls instead of a per-row scatter/dynamic-update
    (~3 us/row on TPU).

    rows: (R, W0) with W0 <= width.  Safe for any shift in [0, width) as
    long as bytes past a row's intended content are already zero (wrapped
    positions then only carry zeros); callers mask rows first.
    """
    R, W0 = rows.shape
    assert W0 <= width, (W0, width)
    r = jnp.pad(rows, ((0, 0), (0, width - W0)))
    s = jnp.clip(shift, 0, width - 1).astype(jnp.int32)
    for k in range(max(int(width - 1).bit_length(), 1)):
        sh = 1 << k
        rolled = jnp.concatenate([r[:, -sh:], r[:, :-sh]], axis=1)
        r = jnp.where(((s >> k) & 1)[:, None] == 1, rolled, r)
    return r
