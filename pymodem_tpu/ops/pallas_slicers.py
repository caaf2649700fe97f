"""Binary symbol-timing slicer as a Pallas TPU lane kernel.

Same motivation and layout as dsp/pallas_loops.py: the `lax.scan` slicer
(ops/slicers.py binary_slice, mirroring slicer.py:59-107) pays XLA loop
overhead per time step; here all (chains x blocks) lanes tile into
(rt, 128) VPU registers, the 4-register slicer state (phase clock, last
sample, working byte, bit count) lives in VMEM scratch persisting across
sequential time-chunk grid steps, and emissions stream out as one int32
per (lane, sample): ``0x100 | byte`` when a byte completes, else 0
(byte value 0 stays distinguishable via bit 8).

Numerics: identical op order and primitives as binary_slice, so decisions
match the scan engine bit for bit on TPU (the step is compare/select/
int-shift arithmetic only -- no transcendentals).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

LANE = 128
DEFAULT_RT = 32
DEFAULT_TC = 128

# per-lane parameter rows
_BIN_PARAMS = ("sps", "lock_rate")


def _binary_kernel(params_ref, x_ref, out_ref, fstate_ref, istate_ref, *,
                   tc: int, rt: int, groups: int, window: int = 1,
                   t_total: int | None = None):
    from jax.experimental import pallas as pl

    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        z = jnp.zeros((rt, LANE), jnp.float32)
        fstate_ref[0] = z  # phase clock
        fstate_ref[1] = z  # last sample
        iz = jnp.zeros((rt, LANE), jnp.int32)
        istate_ref[0] = iz  # working byte
        istate_ref[1] = iz  # bit count

    gr = rt // groups
    sl = [slice(g * gr, (g + 1) * gr) for g in range(groups)]

    def pg(i, g):
        return params_ref[i, sl[g], :]

    def step_group(t, carry, g):
        # slicer.py:59-107 decision logic, op-for-op as binary_slice
        clock, last, byte, bit_count = carry[:4]
        sps = pg(0, g)
        rollover = sps / 2.0 - 0.5
        clock = clock + 1.0
        decide = clock >= rollover
        clock = jnp.where(decide, clock - sps, clock)
        x_t = x_ref[sl[g], t, :]
        bit = jnp.where(x_t >= 0, 1, 0)
        byte = jnp.where(decide, ((byte << 1) & 0xFF) | bit, byte)
        bit_count = jnp.where(decide, bit_count + 1, bit_count)
        emit = decide & (bit_count >= 8)
        bit_count = jnp.where(emit, 0, bit_count)
        crossing = ((last < 0.0) & (x_t >= 0.0)) | ((last >= 0.0) & (x_t < 0.0))
        clock = jnp.where(crossing, clock * pg(1, g), clock)
        if window == 1:
            out_ref[sl[g], t, :] = jnp.where(emit, 0x100 | byte, 0)
            return (clock, x_t, byte, bit_count)
        # windowed emission: at most one byte per ``window`` samples
        # (safe_compact_window), so the window's encoded value is the OR
        # of its per-sample encodings, with the in-window position in
        # bits 16+.  Samples past the real stream end (zero padding would
        # otherwise keep emitting) are masked here, at the only place the
        # global time is known.
        in_range = (t_idx * tc + t) < t_total
        enc = jnp.where(emit & in_range,
                        ((t % window) << 16) | 0x100 | byte, 0)
        acc = jnp.where(t % window == 0, jnp.zeros_like(carry[4]), carry[4])
        acc = acc | enc
        out_ref[sl[g], t // window, :] = acc
        return (clock, x_t, byte, bit_count, acc)

    def step(t, carries):
        return tuple(step_group(t, carries[g], g) for g in range(groups))

    carries = tuple(
        (fstate_ref[0, sl[g], :], fstate_ref[1, sl[g], :],
         istate_ref[0, sl[g], :], istate_ref[1, sl[g], :])
        + ((istate_ref[1, sl[g], :] * 0,) if window > 1 else ())
        for g in range(groups)
    )
    carries = jax.lax.fori_loop(0, tc, step, carries)
    for g in range(groups):
        fstate_ref[0, sl[g], :] = carries[g][0]
        fstate_ref[1, sl[g], :] = carries[g][1]
        istate_ref[0, sl[g], :] = carries[g][2]
        istate_ref[1, sl[g], :] = carries[g][3]


@partial(jax.jit, static_argnames=("tc", "rt", "groups", "window"))
def binary_slice_lanes_pallas(x: jax.Array, lane_params: jax.Array,
                              tc: int | None = None, rt: int | None = None,
                              groups: int = 2, window: int = 1) -> jax.Array:
    """Binary-slice (L, T) float32 lanes -> int32 encoded emissions.

    lane_params: (2, L) float32 rows (sps, lock_rate).

    window=1: (L, T) output; an element is ``0x100 | byte`` on the sample
    that completed a byte, else 0 -- decode with ``decode_emissions``.

    window=w>1 (w a power of two dividing the time chunk, and safe per
    ops/slicers.safe_compact_window): (L, ceil(T/w)) output; each element
    encodes the window's single emission as
    ``(pos_in_window << 16) | 0x100 | byte`` (0 = none) -- feed to
    ops/slicers.compact_windowed.  This moves the 1-per-w windowed
    reduction INTO the kernel, shrinking the emission readback and the
    post-kernel traffic by w (the XLA windowed reduce over the dense
    (L, T) int32 output dominated the AFSK bank demod).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = x.astype(jnp.float32)  # the kernel is the f32 accelerator path
    L, T = x.shape
    if rt is None or tc is None:
        from ..dsp.pallas_loops import auto_tile

        a_rt, a_tc = auto_tile(L)
        rt = a_rt if rt is None else rt
        tc = a_tc if tc is None else tc
    if window > 1:
        assert window & (window - 1) == 0, window
        # the out block's second-to-last dim (tc/window) must be >= 8 for
        # the Mosaic lowering; windows never straddle time chunks, and rt
        # shrinks to keep the rt*tc VMEM tile within the scoped budget
        tc = max(tc - tc % window, 8 * window)
        rt = max(8, min(rt, (4096 // tc) // 8 * 8 or 8))
    # group slabs must stay (8k, 128)-shaped: fall back to 1 when the
    # (possibly auto-chosen) rt can't split into groups of 8-row multiples
    if rt % groups or (rt // groups) % 8:
        groups = 1
    lanes_per_tile = rt * LANE
    Lp = -(-L // lanes_per_tile) * lanes_per_tile
    Tp = -(-T // tc) * tc
    xp = jnp.pad(x, ((0, Lp - L), (0, Tp - T)))
    pp = jnp.pad(lane_params, ((0, 0), (0, Lp - L)),
                 constant_values=1.0)  # sps=1 keeps padded lanes finite
    R = Lp // LANE
    xr = xp.reshape(R, LANE, Tp).transpose(0, 2, 1)
    pr = pp.reshape(2, R, LANE)

    assert rt % groups == 0 and (rt // groups) % 8 == 0, (rt, groups)
    t_out = Tp // window
    out = pl.pallas_call(
        partial(_binary_kernel, tc=tc, rt=rt, groups=groups, window=window,
                t_total=T),
        grid=(R // rt, Tp // tc),
        in_specs=[
            pl.BlockSpec((2, rt, LANE), lambda r, t: (0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, tc, LANE), lambda r, t: (r, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, tc // window, LANE),
                               lambda r, t: (r, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, t_out, LANE), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, rt, LANE), jnp.float32),
            pltpu.VMEM((2, rt, LANE), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(pr, xr)

    n_keep = T if window == 1 else -(-T // window)
    return out.transpose(0, 2, 1).reshape(Lp, t_out)[:L, :n_keep]


def decode_emissions(enc: jax.Array):
    """(..., T) int32 encoded emissions -> SlicerOut(valid, byte)."""
    from .slicers import SlicerOut

    return SlicerOut((enc & 0x100) != 0, (enc & 0xFF).astype(jnp.uint8))


def _demap_select(state, demap: tuple):
    """Static-table lookup as unrolled selects: demap is a bank-uniform
    host constant (part of the bank grouping key), so ``demap[state]``
    becomes sum_k [state == k] * demap[k] with zero entries skipped --
    element gathers from VMEM tables are not a Pallas TPU primitive."""
    out = jnp.zeros_like(state)
    for k, v in enumerate(demap):
        if v:
            out = jnp.where(state == k, v, out)
    return out


def _emit_encode(out_ref, row_slice, t, emit, out_byte, carry_acc, *,
                 tc: int, window: int, t_total: int, t_idx):
    """Shared emission-stream encoding (see binary kernel docstring):
    window=1 writes the dense per-sample code; window>1 ORs into the
    window accumulator and writes at window granularity.  Returns the
    updated accumulator (None when window == 1)."""
    if window == 1:
        out_ref[row_slice, t, :] = jnp.where(emit, 0x100 | out_byte, 0)
        return None
    in_range = (t_idx * tc + t) < t_total
    enc = jnp.where(emit & in_range,
                    ((t % window) << 16) | 0x100 | out_byte, 0)
    acc = jnp.where(t % window == 0, jnp.zeros_like(carry_acc), carry_acc)
    acc = acc | enc
    out_ref[row_slice, t // window, :] = acc
    return acc


def _quad_kernel(params_ref, i_ref, q_ref, out_ref, fstate_ref, istate_ref,
                 *, tc: int, rt: int, groups: int, demap: tuple,
                 state_mask: int, bps: int, window: int = 1,
                 t_total: int | None = None):
    from jax.experimental import pallas as pl

    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        z = jnp.zeros((rt, LANE), jnp.float32)
        fstate_ref[0] = z  # phase clock
        fstate_ref[1] = z  # last I
        fstate_ref[2] = z  # last Q
        iz = jnp.zeros((rt, LANE), jnp.int32)
        istate_ref[0] = iz  # working byte
        istate_ref[1] = iz  # bit count
        istate_ref[2] = iz  # state register

    gr = rt // groups
    sl = [slice(g * gr, (g + 1) * gr) for g in range(groups)]

    def pg(i, g):
        return params_ref[i, sl[g], :]

    def step_group(t, carry, g):
        # slicer.py:193-242 decision logic, op-for-op as quadrature_slice
        clock, last_i, last_q, byte, bit_count, state = carry[:6]
        sps = pg(0, g)
        rollover = sps / 2.0 - 0.5
        clock = clock + 1.0
        decide = clock >= rollover
        clock = jnp.where(decide, clock - sps, clock)
        xi = i_ref[sl[g], t, :]
        xq = q_ref[sl[g], t, :]
        new_state = ((state << 2) & state_mask) \
            | jnp.where(xi >= 0, 2, 0) | jnp.where(xq >= 0, 1, 0)
        state = jnp.where(decide, new_state, state)
        byte = jnp.where(
            decide, (byte << bps) | _demap_select(state, demap), byte
        )
        bit_count = jnp.where(decide, bit_count + bps, bit_count)
        emit = decide & (bit_count >= 8)
        bit_count = jnp.where(emit, 0, bit_count)
        out_byte = byte & 0xFF
        byte = jnp.where(emit, out_byte, byte)
        crossing = (
            ((last_i < 0.0) & (xi >= 0.0)) | ((last_i >= 0.0) & (xi < 0.0))
            | ((last_q < 0.0) & (xq >= 0.0)) | ((last_q >= 0.0) & (xq < 0.0))
        )
        clock = jnp.where(crossing, clock * pg(1, g), clock)
        acc = _emit_encode(out_ref, sl[g], t, emit, out_byte,
                           carry[6] if window > 1 else None,
                           tc=tc, window=window, t_total=t_total, t_idx=t_idx)
        base = (clock, xi, xq, byte, bit_count, state)
        return base + ((acc,) if window > 1 else ())

    def step(t, carries):
        return tuple(step_group(t, carries[g], g) for g in range(groups))

    carries = tuple(
        (fstate_ref[0, sl[g], :], fstate_ref[1, sl[g], :],
         fstate_ref[2, sl[g], :], istate_ref[0, sl[g], :],
         istate_ref[1, sl[g], :], istate_ref[2, sl[g], :])
        + ((istate_ref[1, sl[g], :] * 0,) if window > 1 else ())
        for g in range(groups)
    )
    carries = jax.lax.fori_loop(0, tc, step, carries)
    for g in range(groups):
        for i in range(3):
            fstate_ref[i, sl[g], :] = carries[g][i]
            istate_ref[i, sl[g], :] = carries[g][3 + i]


_FL_DEPTH = 8  # four-level threshold ring depth (ops/slicers.py)


def _four_level_kernel(params_ref, x_ref, out_ref, fstate_ref, istate_ref,
                       *, tc: int, rt: int, groups: int, demap: tuple,
                       window: int = 1, t_total: int | None = None):
    from jax.experimental import pallas as pl

    t_idx = pl.program_id(1)
    n_f = 4 + _FL_DEPTH  # clock1, clock2, last, threshold, ring[8]

    @pl.when(t_idx == 0)
    def _():
        z = jnp.zeros((rt, LANE), jnp.float32)
        for i in range(n_f):
            fstate_ref[i] = z
        iz = jnp.zeros((rt, LANE), jnp.int32)
        for i in range(4):  # byte, bit count, sync register, ring index
            istate_ref[i] = iz

    gr = rt // groups
    sl = [slice(g * gr, (g + 1) * gr) for g in range(groups)]

    def pg(i, g):
        return params_ref[i, sl[g], :]

    def step_group(t, carry, g):
        # ops/slicers.four_level_slice decision logic (fix-forward form of
        # slicer.py:329-441), op-for-op
        (clock1, clock2, last, threshold) = carry[:4]
        ring = carry[4:4 + _FL_DEPTH]
        byte, bit_count, sync, ring_index = carry[4 + _FL_DEPTH:
                                                  8 + _FL_DEPTH]
        sps = pg(0, g)
        rollover = sps / 2.0 - 0.5
        x_t = x_ref[sl[g], t, :]
        clock1 = clock1 + 1.0
        roll1 = clock1 > rollover
        clock1 = jnp.where(roll1, clock1 - sps, clock1)
        ring_index = jnp.where(
            roll1,
            jnp.where(ring_index + 1 >= _FL_DEPTH, 0, ring_index + 1),
            ring_index,
        )
        new_val = jnp.abs(x_t) * (2.0 / 3.0)
        ring = tuple(
            jnp.where(roll1 & (ring_index == r), new_val, ring[r])
            for r in range(_FL_DEPTH)
        )
        sync = jnp.where(
            roll1, ((sync << 1) & 0xFFFF) + jnp.where(x_t > 0, 1, 0), sync
        )
        sync_hit = roll1 & ((sync == 0x5555) | (sync == 0xCCCC))
        ring_sum = ring[0]
        for r in range(1, _FL_DEPTH):
            ring_sum = ring_sum + ring[r]
        threshold = jnp.where(sync_hit, ring_sum / _FL_DEPTH, threshold)
        clock2 = jnp.where(sync_hit, clock1, clock2) + 1.0
        roll2 = clock2 > rollover
        clock2 = jnp.where(roll2, clock2 - sps, clock2)
        symbol = jnp.where(
            x_t > 0,
            jnp.where(x_t >= threshold, 3, 2),
            jnp.where(x_t <= -threshold, 0, 1),
        )
        byte = jnp.where(
            roll2, ((byte << 2) & 0xFF) + _demap_select(symbol, demap), byte
        )
        bit_count = jnp.where(roll2, bit_count + 2, bit_count)
        emit = roll2 & (bit_count >= 8)
        bit_count = jnp.where(emit, 0, bit_count)
        crossing = ((last < 0.0) & (x_t >= 0.0)) | ((last >= 0.0) & (x_t < 0.0))
        clock1 = jnp.where(crossing, clock1 * pg(1, g), clock1)
        acc = _emit_encode(out_ref, sl[g], t, emit, byte,
                           carry[8 + _FL_DEPTH] if window > 1 else None,
                           tc=tc, window=window, t_total=t_total, t_idx=t_idx)
        base = (clock1, clock2, x_t, threshold) + ring \
            + (byte, bit_count, sync, ring_index)
        return base + ((acc,) if window > 1 else ())

    def step(t, carries):
        return tuple(step_group(t, carries[g], g) for g in range(groups))

    carries = tuple(
        tuple(fstate_ref[i, sl[g], :] for i in range(n_f))
        + tuple(istate_ref[i, sl[g], :] for i in range(4))
        + ((istate_ref[1, sl[g], :] * 0,) if window > 1 else ())
        for g in range(groups)
    )
    carries = jax.lax.fori_loop(0, tc, step, carries)
    for g in range(groups):
        for i in range(n_f):
            fstate_ref[i, sl[g], :] = carries[g][i]
        for i in range(4):
            istate_ref[i, sl[g], :] = carries[g][n_f + i]


def _lane_pallas_call(kernel, inputs, lane_params, *, n_fstate: int,
                      n_istate: int, tc: int | None, rt: int | None,
                      groups: int, window: int, kernel_kwargs: dict):
    """Shared pallas_call plumbing for the slicer lane kernels: pad lanes
    to (rt, 128) register tiles, pad/chunk time, run the grid, and trim
    the emission stream back to (L, ceil(T/window))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    inputs = [x.astype(jnp.float32) for x in inputs]
    L, T = inputs[0].shape
    if rt is None or tc is None:
        from ..dsp.pallas_loops import auto_tile

        a_rt, a_tc = auto_tile(L)
        rt = a_rt if rt is None else rt
        tc = a_tc if tc is None else tc
    if window > 1:
        assert window & (window - 1) == 0, window
        tc = max(tc - tc % window, 8 * window)
        rt = max(8, min(rt, (4096 // tc) // 8 * 8 or 8))
    if rt % groups or (rt // groups) % 8:
        groups = 1
    lanes_per_tile = rt * LANE
    Lp = -(-L // lanes_per_tile) * lanes_per_tile
    Tp = -(-T // tc) * tc
    xps = [jnp.pad(x, ((0, Lp - L), (0, Tp - T))) for x in inputs]
    pp = jnp.pad(lane_params, ((0, 0), (0, Lp - L)), constant_values=1.0)
    R = Lp // LANE
    xrs = [x.reshape(R, LANE, Tp).transpose(0, 2, 1) for x in xps]
    n_param = lane_params.shape[0]
    pr = pp.reshape(n_param, R, LANE)

    assert rt % groups == 0 and (rt // groups) % 8 == 0, (rt, groups)
    t_out = Tp // window
    out = pl.pallas_call(
        partial(kernel, tc=tc, rt=rt, groups=groups, window=window,
                t_total=T, **kernel_kwargs),
        grid=(R // rt, Tp // tc),
        in_specs=[
            pl.BlockSpec((n_param, rt, LANE), lambda r, t: (0, r, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((rt, tc, LANE), lambda r, t: (r, t, 0),
                         memory_space=pltpu.VMEM)
            for _ in xrs
        ],
        out_specs=pl.BlockSpec((rt, tc // window, LANE),
                               lambda r, t: (r, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, t_out, LANE), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n_fstate, rt, LANE), jnp.float32),
            pltpu.VMEM((n_istate, rt, LANE), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(pr, *xrs)

    n_keep = T if window == 1 else -(-T // window)
    return out.transpose(0, 2, 1).reshape(Lp, t_out)[:L, :n_keep]


@partial(jax.jit, static_argnames=("demap", "state_mask", "bps", "tc", "rt",
                                   "groups", "window"))
def quadrature_slice_lanes_pallas(i_lanes: jax.Array, q_lanes: jax.Array,
                                  lane_params: jax.Array, demap: tuple,
                                  state_mask: int, bps: int,
                                  tc: int | None = None, rt: int | None = None,
                                  groups: int = 2,
                                  window: int = 1) -> jax.Array:
    """Quadrature-slice (L, T) float32 I/Q lane pairs -> int32 encoded
    emissions (see binary_slice_lanes_pallas for the encoding / window
    semantics).  lane_params: (2, L) float32 rows (sps, lock_rate);
    ``demap``/``state_mask``/``bps`` are bank-uniform statics (part of the
    bank grouping key, runtime/bank.py group_chains)."""
    return _lane_pallas_call(
        _quad_kernel, [i_lanes, q_lanes], lane_params,
        n_fstate=3, n_istate=3, tc=tc, rt=rt, groups=groups, window=window,
        kernel_kwargs=dict(demap=demap, state_mask=state_mask, bps=bps),
    )


@partial(jax.jit, static_argnames=("demap", "tc", "rt", "groups", "window"))
def four_level_slice_lanes_pallas(x: jax.Array, lane_params: jax.Array,
                                  demap: tuple, tc: int | None = None,
                                  rt: int | None = None, groups: int = 2,
                                  window: int = 1) -> jax.Array:
    """Four-level-slice (L, T) float32 lanes -> int32 encoded emissions
    (fix-forward 4FSK slicer; decision logic of ops/slicers.py
    four_level_slice).  lane_params: (2, L) rows (sps, lock_rate)."""
    return _lane_pallas_call(
        _four_level_kernel, [x], lane_params,
        n_fstate=4 + _FL_DEPTH, n_istate=4, tc=tc, rt=rt, groups=groups,
        window=window, kernel_kwargs=dict(demap=demap),
    )
