"""Symbol-timing-recovery slicers as `lax.scan` recurrences.

Each reference slicer is a per-sample FSM: a phase clock advances by 1.0 per
sample, a symbol decision fires when it crosses ``rollover_threshold``
(then the clock rewinds by samples_per_symbol), and any zero crossing in the
input multiplies the clock by ``lock_rate`` to pull it toward alignment
(slicer.py:59-107 binary, :193-242 quadrature, :329-441 four-level).

Device formulation: the scan emits one (valid, byte) slot per input sample;
a byte slot is valid on the sample that completed 8 bits.  Emitted slots are
then compacted into a dense byte stream with a windowed reduce + small
cumsum/scatter -- no dynamic shapes anywhere.  Stream addresses are 1-based sample indices of
the modem-output stream (slicer.py:75), the cross-chain correlation key.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SlicerOut(NamedTuple):
    """Per-sample emission stream.  Stream addresses are NOT materialized:
    an emission's address is its sample position + 1 (slicer.py:75), which
    compact_bytes reconstructs -- emitting them from the scan would add a
    (N,) int32 output buffer per lane for pure index data."""

    valid: jax.Array  # (N,) bool -- a completed byte was emitted at this sample
    byte: jax.Array  # (N,) uint8


def compact_bytes(out: SlicerOut, capacity: int, window: int = 1):
    """Pack valid slots into dense (bytes, addresses, count) arrays.

    ``window``: when > 1, emissions are first reduced over non-overlapping
    windows of that many samples (each window may contain at most one
    emission -- a byte needs >= 8/bits_per_symbol symbol periods, so any
    window below that spacing is safe; see safe_compact_window).  The
    scatter then runs over N/window elements instead of N, which is the
    difference between the scatter dominating the device step and being
    free on TPU.
    """
    valid, byte = out.valid, out.byte.astype(jnp.int32)
    n = valid.shape[-1]
    if window > 1:
        pad = (-n) % window
        if pad:
            valid = jnp.pad(valid, (0, pad))
            byte = jnp.pad(byte, (0, pad))
        v = valid.reshape(-1, window)
        # explicit dtype: integer jnp.sum otherwise promotes to int64 under
        # x64, tripping the int32 scatter below
        byte = jnp.sum(jnp.where(v, byte.reshape(-1, window), 0), axis=1,
                       dtype=jnp.int32)
        base = jnp.arange(v.shape[0], dtype=jnp.int32) * window
        address = base + jnp.argmax(v, axis=1).astype(jnp.int32) + 1
        valid = jnp.any(v, axis=1)
    else:
        address = jnp.arange(1, valid.shape[-1] + 1, dtype=jnp.int32)
    idx = jnp.cumsum(valid.astype(jnp.int32)) - 1
    pos = jnp.where(valid, idx, capacity)  # invalid slots dropped
    # in-bounds indices are unique by construction (cumsum ranks; every
    # invalid slot maps to the out-of-range drop index), so the scatter
    # can skip collision handling -- .set(unique_indices=True) measured
    # 21% faster than .add on TPU at the PLL bench shape (2026-08-20)
    data = jnp.zeros((capacity,), jnp.int32).at[pos].set(
        byte, mode="drop", unique_indices=True)
    addr = jnp.zeros((capacity,), jnp.int32).at[pos].set(
        jnp.where(valid, address, 0), mode="drop", unique_indices=True)
    count = jnp.sum(valid.astype(jnp.int32))
    return data, addr, count


def compact_windowed(enc: jax.Array, window: int, capacity: int):
    """compact_bytes for kernel-windowed emissions (ops/pallas_slicers.py
    binary_slice_lanes_pallas window>1): enc (NW,) int32 encodes each
    window's single emission as ``(pos_in_window << 16) | 0x100 | byte``
    (0 = none).  Produces the same dense (bytes, addresses, count) arrays
    as compact_bytes on the dense emission stream.

    ONE scatter, not two: (window index, pos, byte) pack into a single
    int32 value and data/addresses unpack elementwise after.  The
    scatter is the dominant cost of this stage at ~7 ns per element on
    TPU (the window-16 4FSK bank compacts 14.8M windows per group), so
    halving the scattered elements halves the stage.  The pack uses
    exactly log2(window) bits for the in-window position (window is a
    power of two, static), so windex gets 23 - log2(window) bits --
    i.e. any block up to 2^23 demod samples, far past the lane-path
    geometry; a windex overflow would flip the int32 SIGN bit and emit
    negative stream addresses, so larger blocks (scan-engine territory)
    take the two-scatter form instead of silently corrupting."""
    valid = (enc & 0x100) != 0
    nw = enc.shape[-1]
    assert window & (window - 1) == 0, window
    pbits = window.bit_length() - 1
    if nw << pbits > 1 << 23:  # static: block too long for the packed form
        byte = (enc & 0xFF).astype(jnp.int32)
        poff = (enc >> 16).astype(jnp.int32)
        base = jnp.arange(nw, dtype=jnp.int32) * window
        address = base + poff + 1
        idx = jnp.cumsum(valid.astype(jnp.int32)) - 1
        pos = jnp.where(valid, idx, capacity)
        data = jnp.zeros((capacity,), jnp.int32).at[pos].set(
            byte, mode="drop", unique_indices=True)
        addr = jnp.zeros((capacity,), jnp.int32).at[pos].set(
            jnp.where(valid, address, 0), mode="drop", unique_indices=True)
        return data, addr, jnp.sum(valid.astype(jnp.int32))
    windex = jnp.arange(nw, dtype=jnp.int32)
    packed = (
        (windex << (8 + pbits)) | ((enc >> 16) << 8) | (enc & 0xFF)
    ).astype(jnp.int32)
    idx = jnp.cumsum(valid.astype(jnp.int32)) - 1
    pos = jnp.where(valid, idx, capacity)
    # unique in-bounds indices (see compact_bytes): collision-free .set
    out = jnp.zeros((capacity,), jnp.int32).at[pos].set(
        packed, mode="drop", unique_indices=True)
    count = jnp.sum(valid.astype(jnp.int32))
    data = out & 0xFF
    filled = jnp.arange(capacity, dtype=jnp.int32) < count
    addr = jnp.where(
        filled,
        (out >> (8 + pbits)) * window + ((out >> 8) & (window - 1)) + 1,
        0,
    )
    return data, addr, count


def safe_compact_window(samples_per_symbol: float, lock_rate: float,
                        bits_per_symbol: int) -> int:
    """Largest power-of-two window guaranteed to hold at most one byte
    emission: a byte takes 8/bps symbol decisions, each at least
    ~samples_per_symbol * lock_rate samples after the previous."""
    spacing = (8.0 / bits_per_symbol) * samples_per_symbol * lock_rate
    w = 1
    while w * 2 <= max(spacing * 0.45, 1.0):
        w *= 2
    return min(w, 256)


class _BinaryCarry(NamedTuple):
    phase_clock: jax.Array
    working_byte: jax.Array
    bit_count: jax.Array
    last_sample: jax.Array


@partial(jax.jit, static_argnames=("unroll",))
def binary_slice(samples: jax.Array, samples_per_symbol: jax.Array,
                 lock_rate: jax.Array, unroll: int = 8) -> SlicerOut:
    """2-level slicer (slicer.py:59-107)."""
    dtype = samples.dtype
    rollover = samples_per_symbol / 2.0 - 0.5

    def step(c: _BinaryCarry, x):
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
        carry = _BinaryCarry(clock, byte, bit_count, x)
        return carry, SlicerOut(emit, byte.astype(jnp.uint8))

    init = _BinaryCarry(
        jnp.zeros((), dtype), jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        jnp.zeros((), dtype),
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
        carry = _QuadCarry(clock, byte, bit_count, xi, xq, state)
        return carry, SlicerOut(emit, out_byte.astype(jnp.uint8))

    init = _QuadCarry(
        jnp.zeros((), dtype), jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        jnp.zeros((), dtype), jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
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
                                ring, ring_index)
        return carry, SlicerOut(emit, byte.astype(jnp.uint8))

    init = _FourLevelCarry(
        jnp.zeros((), dtype), jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32), jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
        jnp.asarray(initial_threshold, dtype), jnp.zeros((depth,), dtype),
        jnp.zeros((), jnp.int32),
    )
    _, out = jax.lax.scan(step, init, samples, unroll=unroll)
    return out
