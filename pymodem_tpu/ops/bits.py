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
