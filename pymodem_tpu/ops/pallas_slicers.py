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
