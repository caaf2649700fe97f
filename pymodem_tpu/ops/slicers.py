"""Symbol-timing-recovery slicers as `lax.scan` recurrences.

Each reference slicer is a per-sample FSM: a phase clock advances by 1.0 per
sample, a symbol decision fires when it crosses ``rollover_threshold``
(then the clock rewinds by samples_per_symbol), and any zero crossing in the
input multiplies the clock by ``lock_rate`` to pull it toward alignment
(slicer.py:59-107 binary, :193-242 quadrature, :329-441 four-level).

Device formulation: the scan emits one (valid, byte, address) slot per input
sample; a byte slot is valid on the sample that completed 8 bits.  Emitted
slots are then compacted into a dense byte stream with a cumsum/scatter --
no dynamic shapes anywhere.  Stream addresses are 1-based sample indices of
the modem-output stream (slicer.py:75), the cross-chain correlation key.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SlicerOut(NamedTuple):
    valid: jax.Array  # (N,) bool -- a completed byte was emitted at this sample
    byte: jax.Array  # (N,) int32
    address: jax.Array  # (N,) int32


def compact_bytes(out: SlicerOut, capacity: int):
    """Pack valid slots into dense (bytes, addresses, count) arrays."""
    idx = jnp.cumsum(out.valid.astype(jnp.int32)) - 1
    pos = jnp.where(out.valid, idx, capacity)  # invalid slots dropped
    data = jnp.zeros((capacity,), jnp.int32).at[pos].add(out.byte, mode="drop")
    addr = jnp.zeros((capacity,), jnp.int32).at[pos].add(out.address, mode="drop")
    count = jnp.sum(out.valid.astype(jnp.int32))
    return data, addr, count


class _BinaryCarry(NamedTuple):
    phase_clock: jax.Array
    working_byte: jax.Array
    bit_count: jax.Array
    last_sample: jax.Array
    address: jax.Array


@partial(jax.jit, static_argnames=("unroll",))
def binary_slice(samples: jax.Array, samples_per_symbol: jax.Array,
                 lock_rate: jax.Array, unroll: int = 8) -> SlicerOut:
    """2-level slicer (slicer.py:59-107)."""
    dtype = samples.dtype
    rollover = samples_per_symbol / 2.0 - 0.5

    def step(c: _BinaryCarry, x):
        address = c.address + 1
        clock = c.phase_clock + 1.0
        decide = clock >= rollover
        clock = jnp.where(decide, clock - samples_per_symbol, clock)
        bit = (x >= 0).astype(jnp.int32)
        byte = jnp.where(decide, ((c.working_byte << 1) & 0xFF) | bit, c.working_byte)
        bit_count = jnp.where(decide, c.bit_count + 1, c.bit_count)
        emit = decide & (bit_count >= 8)
        bit_count = jnp.where(emit, 0, bit_count)
        crossing = ((c.last_sample < 0.0) & (x >= 0.0)) | ((c.last_sample >= 0.0) & (x < 0.0))
        clock = jnp.where(crossing, clock * lock_rate, clock)
        carry = _BinaryCarry(clock, byte, bit_count, x, address)
        return carry, SlicerOut(emit, byte, address)

    init = _BinaryCarry(
        jnp.zeros((), dtype), jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
    )
    _, out = jax.lax.scan(step, init, samples, unroll=unroll)
    return out


class _QuadCarry(NamedTuple):
    phase_clock: jax.Array
    working_byte: jax.Array
    bit_count: jax.Array
    last_i: jax.Array
    last_q: jax.Array
    state_register: jax.Array
    address: jax.Array


@partial(jax.jit, static_argnames=("bits_per_symbol", "unroll"))
def quadrature_slice(i_samples: jax.Array, q_samples: jax.Array,
                     samples_per_symbol: jax.Array, lock_rate: jax.Array,
                     demap: jax.Array, state_mask: jax.Array,
                     bits_per_symbol: int, unroll: int = 8) -> SlicerOut:
    """IQ slicer with Gray demap (slicer.py:193-242)."""
    dtype = i_samples.dtype
    rollover = samples_per_symbol / 2.0 - 0.5

    def step(c: _QuadCarry, xs):
        xi, xq = xs
        address = c.address + 1
        clock = c.phase_clock + 1.0
        decide = clock >= rollover
        clock = jnp.where(decide, clock - samples_per_symbol, clock)
        state = ((c.state_register << 2) & state_mask) \
            | jnp.where(xi >= 0, 2, 0) | jnp.where(xq >= 0, 1, 0)
        state = jnp.where(decide, state, c.state_register)
        byte = jnp.where(
            decide,
            (c.working_byte << bits_per_symbol) | jnp.take(demap, state),
            c.working_byte,
        )
        bit_count = jnp.where(decide, c.bit_count + bits_per_symbol, c.bit_count)
        emit = decide & (bit_count >= 8)
        bit_count = jnp.where(emit, 0, bit_count)
        out_byte = byte & 0xFF
        byte = jnp.where(emit, out_byte, byte)
        crossing = (
            ((c.last_i < 0.0) & (xi >= 0.0)) | ((c.last_i >= 0.0) & (xi < 0.0))
            | ((c.last_q < 0.0) & (xq >= 0.0)) | ((c.last_q >= 0.0) & (xq < 0.0))
        )
        clock = jnp.where(crossing, clock * lock_rate, clock)
        carry = _QuadCarry(clock, byte, bit_count, xi, xq, state, address)
        return carry, SlicerOut(emit, out_byte, address)

    init = _QuadCarry(
        jnp.zeros((), dtype), jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        jnp.zeros((), dtype), jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    _, out = jax.lax.scan(step, init, (i_samples, q_samples), unroll=unroll)
    return out


class _FourLevelCarry(NamedTuple):
    clock1: jax.Array
    clock2: jax.Array
    working_byte: jax.Array
    bit_count: jax.Array
    last_sample: jax.Array
    sync_register: jax.Array
    threshold: jax.Array
    ring: jax.Array  # (8,) threshold sample ring buffer
    ring_index: jax.Array
    address: jax.Array


@partial(jax.jit, static_argnames=("unroll",))
def four_level_slice(samples: jax.Array, samples_per_symbol: jax.Array,
                     lock_rate: jax.Array, demap: jax.Array,
                     initial_threshold: jax.Array, unroll: int = 8) -> SlicerOut:
    """4-level slicer with sync-pattern-driven threshold (slicer.py:329-441).

    Implemented fix-forward: the reference version crashes on undefined
    imports; behaviour here follows its decision logic exactly (two phase
    clocks, 0x5555/0xCCCC sync patterns arming the second clock and the
    decision threshold from an 8-deep |sample| ring buffer).  The envelope
    detectors in the reference only feed debug plots, so they are omitted.
    """
    dtype = samples.dtype
    rollover = samples_per_symbol / 2.0 - 0.5
    depth = 8

    def step(c: _FourLevelCarry, x):
        address = c.address + 1
        clock1 = c.clock1 + 1.0
        roll1 = clock1 > rollover
        clock1 = jnp.where(roll1, clock1 - samples_per_symbol, clock1)
        ring_index = jnp.where(roll1, jnp.where(c.ring_index + 1 >= depth, 0, c.ring_index + 1),
                               c.ring_index)
        ring = jnp.where(roll1, c.ring.at[ring_index].set(jnp.abs(x) * 2.0 / 3.0), c.ring)
        sync = jnp.where(
            roll1,
            ((c.sync_register << 1) & 0xFFFF) + jnp.where(x > 0, 1, 0),
            c.sync_register,
        )
        sync_hit = roll1 & ((sync == 0x5555) | (sync == 0xCCCC))
        threshold = jnp.where(sync_hit, jnp.sum(ring) / depth, c.threshold)
        clock2 = jnp.where(sync_hit, clock1, c.clock2) + 1.0
        roll2 = clock2 > rollover
        clock2 = jnp.where(roll2, clock2 - samples_per_symbol, clock2)
        symbol = jnp.where(
            x > 0,
            jnp.where(x >= threshold, 3, 2),
            jnp.where(x <= -threshold, 0, 1),
        )
        byte = jnp.where(
            roll2,
            ((c.working_byte << 2) & 0xFF) + jnp.take(demap, symbol),
            c.working_byte,
        )
        bit_count = jnp.where(roll2, c.bit_count + 2, c.bit_count)
        emit = roll2 & (bit_count >= 8)
        bit_count = jnp.where(emit, 0, bit_count)
        crossing = ((c.last_sample < 0.0) & (x >= 0.0)) | ((c.last_sample >= 0.0) & (x < 0.0))
        clock1 = jnp.where(crossing, clock1 * lock_rate, clock1)
        carry = _FourLevelCarry(clock1, clock2, byte, bit_count, x, sync, threshold,
                                ring, ring_index, address)
        return carry, SlicerOut(emit, byte, address)

    init = _FourLevelCarry(
        jnp.zeros((), dtype), jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32), jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
        jnp.asarray(initial_threshold, dtype), jnp.zeros((depth,), dtype),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
    )
    _, out = jax.lax.scan(step, init, samples, unroll=unroll)
    return out
