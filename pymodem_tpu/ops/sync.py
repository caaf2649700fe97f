"""IL2P syncword scanning on device.

The IL2P decoder spends nearly all its time sliding a 32-bit window over the
descrambled bit stream comparing against the 24-bit and 32-bit syncwords
(il2p.py:367-376).  That scan is a pure function of the bits, so it runs on
the TPU as 32 shifted selects plus popcounts, and only the (rare) candidate
positions reach the host FSM.  Positions whose window still contains carried
history (the first 32 bits after stream start or after a packet) are
re-checked serially by the host decoder, so the combined result is bit-exact
with the reference's per-bit search.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..codecs.host import SYNC24, SYNC32
from .bits import bytes_to_bits_msb


def il2p_sync_candidates(data: jax.Array, tolerance: int = 0) -> jax.Array:
    """Candidate map for a byte stream.

    data: (..., K) uint8 -> (..., K*8) bool; entry i is True when the 32-bit
    window ending at bit i (bits i-31..i, zero-filled off the left edge)
    matches either syncword within ``tolerance``.  Entries i < 32 are a
    superset/subset of the true seeded-history matches and must be
    re-checked serially by the caller.
    """
    bits = bytes_to_bits_msb(data).astype(jnp.uint32)
    n = bits.shape[-1]
    window = jnp.zeros_like(bits)
    for k in range(32):
        # bit k steps from the window end: shifted-left stream, zero fill
        shifted = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(31 - k, 0)])[..., :n]
        window = (window << 1) | shifted
    d24 = jax.lax.population_count((window & 0xFFFFFF) ^ SYNC24)
    d32 = jax.lax.population_count(window ^ SYNC32)
    return (d24 <= tolerance) | (d32 <= tolerance)
