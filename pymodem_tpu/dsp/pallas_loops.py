"""Carrier-recovery loops as Pallas TPU kernels with explicit carry registers.

The `lax.scan` formulation (dsp/loops.py) pays a fixed ~0.4 us of XLA loop
overhead per time step regardless of lane count (tools/scan_sweep.py); the
VPU latency-chain bound for the ~15-op PLL step is ~100x smaller.  Here the
whole loop is ONE kernel: lanes are tiled into (8, 128) VPU registers, the
loop state (phase, control, IIR registers, PI integral) lives in VMEM
scratch that persists across sequential time-chunk grid steps, and the
per-step input/output slices stream through VMEM blocks -- no per-step HBM
round trip, no while-loop bookkeeping.

Numerics: identical op order and primitives as the f32 scan path
(dsp/loops.py _nco_step/_iir_step/_pi_step -- afsk_pll.py:153-165,
psk.py:173-189 for the reference loops).  Mosaic's f32 `sin` is bitwise
identical to XLA's (verified on hardware), so decisions match the scan
engine bit for bit on TPU.

Layout: lanes (chains x blocks) pad to a multiple of 8*128 and reshape to
(R, T, 128); grid = (R/8, T/TC) iterates time fastest, so the scratch carry
is per-lane-tile sequential, exactly like the scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .loops import TWO_PI, LoopParams

LANE = 128  # lane-tile columns
# Tile shape is bounded by the 16 MB scoped-VMEM limit: the in and out
# blocks are (rt, tc, 128) f32 each, double-buffered by the Mosaic
# pipeline, so rt*tc must stay <= ~6800 (rt=64/tc=512 OOMs on v5e).
# (32, 128) measured fastest among the legal shapes at >= 4096 live lanes
# (tools/pallas_loop_sweep).
DEFAULT_RT = 32  # lane-tile rows: tall tiles pipeline the dependent
# ~15-op chain across rows, hiding VPU op latency that an (8,128) tile
# would expose every step
DEFAULT_TC = 128  # time-chunk columns per grid step


def auto_tile(n_lanes: int) -> tuple[int, int]:
    """(rt, tc) for a lane count, from a hardware sweep of the FUSED
    (AGC+loop, 15 param rows / 7 carries) kernel (2026-08-20, v5e):

        lanes 1024:        (8,512) 2.85G  (16,256) 2.25  (32,128) 1.41
        lanes 2048:        (16,128) 4.27  (16,256) 4.06  (32,128) 2.63
        lanes 4096..8192:  (16,128) 4.29  ~ (16,256)     (32,128) 4.15

    (16, 128) is best or within noise everywhere at >= 2048 live lanes.
    Below one exact (8, 512) tile the short tile wins; BETWEEN the quanta
    the padded cost decides: at e.g. 1032 live lanes both shapes pad to
    2048 rows, so (16, 128) at its 4.27G padded rate beats (8, 512) at
    2.85G -- the threshold is one 1024 tile, not 2048.  (The bare unfused
    kernel prefers taller tiles -- registers are the binding resource, so
    fusion moves the optimum.)"""
    if n_lanes > 1024:
        return 16, 128
    return 8, 512

# per-lane scalar parameter rows, in this order
_PLL_PARAMS = ("phase_scale", "set_frequency", "index_scale", "iir_b0",
               "iir_a1", "pi_gp", "pi_gain", "pi_i", "pi_limit",
               "pi_integral0")
# optional AGC fusion rows appended after _PLL_PARAMS: the AGC envelope
# follower (agc.py:26-80) runs inside the loop kernel, removing the
# separate vmapped-scan stage and its HBM round trip of the FIR output.
_AGC_PARAMS = ("attack_step", "decay_step", "sustain_time",
               "sustain_increment", "target")


def _wrap(p, two_pi):
    p = jnp.where(p >= two_pi, p - two_pi, p)
    p = jnp.where(p >= two_pi, p - two_pi, p)
    p = jnp.where(p < 0, p + two_pi, p)
    p = jnp.where(p < 0, p + two_pi, p)
    return p


def _loop_kernel(params_ref, x_ref, out_ref, state_ref, *, tc: int,
                 kind: str, wavetable_size: int, rt: int, groups: int,
                 fuse_agc: bool):
    from jax.experimental import pallas as pl

    t_idx = pl.program_id(1)
    if kind == "agc":
        n_state = 2
    else:
        n_state = 7 if fuse_agc else 5

    @pl.when(t_idx == 0)
    def _():
        z = jnp.zeros((rt, LANE), jnp.float32)
        for i in range(n_state):
            state_ref[i] = z
        if kind != "agc":
            state_ref[4] = params_ref[9]  # integral0

    # group g's sublane slab: rows [g*gr, (g+1)*gr).  groups > 1 splits the
    # tile into INDEPENDENT carry chains whose (gr, 128) ops interleave in
    # the instruction stream -- the dependent ~40-op chain per step is
    # latency-bound, and independent groups fill each other's stalls.
    gr = rt // groups
    sl = [slice(g * gr, (g + 1) * gr) for g in range(groups)]

    def pg(i, g):  # parameter row for group g
        return params_ref[i, sl[g], :]

    two_pi = jnp.float32(TWO_PI)
    ang_scale = jnp.float32(TWO_PI / wavetable_size)

    def nco(phase, control, g):
        p = _wrap(phase + pg(0, g) * (pg(1, g) + control), two_pi)
        sine_idx = (p * pg(2, g)).astype(jnp.int32)
        angle = sine_idx.astype(jnp.float32) * ang_scale
        return p, angle

    def read_x(t, carry, g):
        """Input sample, optionally through the fused AGC follower
        (op-for-op agc_apply, agc.py:26-80)."""
        x_t = x_ref[sl[g], t, :]
        if not fuse_agc:
            return x_t, ()
        env, sustain = carry[5], carry[6]
        cv = jnp.abs(x_t)
        rising = cv > env
        env = jnp.where(rising, jnp.minimum(env + pg(10, g), cv), env)
        sustain = jnp.where(rising, jnp.zeros_like(sustain), sustain)
        decaying = sustain >= pg(12, g)
        env = jnp.where(decaying,
                        jnp.maximum(env - pg(11, g), jnp.zeros_like(env)),
                        env)
        sustain = sustain + pg(13, g)
        x_t = jnp.where(env != 0, pg(14, g) * x_t / env, x_t)
        return x_t, (env, sustain)

    if kind == "agc":
        # standalone AGC lanes (agc.py:26-80): params rows are
        # _AGC_PARAMS only (attack_step at row 0)
        def step_group(t, carry, g):
            env, sustain = carry
            x_t = x_ref[sl[g], t, :]
            cv = jnp.abs(x_t)
            rising = cv > env
            env = jnp.where(rising, jnp.minimum(env + pg(0, g), cv), env)
            sustain = jnp.where(rising, jnp.zeros_like(sustain), sustain)
            decaying = sustain >= pg(2, g)
            env = jnp.where(
                decaying, jnp.maximum(env - pg(1, g), jnp.zeros_like(env)),
                env)
            sustain = sustain + pg(3, g)
            out_ref[sl[g], t, :] = jnp.where(env != 0, pg(4, g) * x_t / env,
                                             x_t)
            return (env, sustain)
    elif kind == "afsk_pll":
        # afsk_pll.py:153-165: mixer = x*sine; IIR; PI; output = prop
        def step_group(t, carry, g):
            phase, control, iir_x, iir_y, integral = carry[:5]
            x_t, agc_carry = read_x(t, carry, g)
            p, angle = nco(phase, control, g)
            sine = jnp.sin(angle)
            mixer = x_t * sine
            y = (pg(3, g) * mixer + pg(3, g) * iir_x) + pg(4, g) * iir_y
            prop = pg(5, g) * y
            integral = jnp.clip(integral + pg(6, g) * (pg(7, g) * y),
                                -pg(8, g), pg(8, g))
            control = prop + integral
            out_ref[sl[g], t, :] = prop
            return (p, control, mixer, y, integral) + agc_carry
    elif kind == "bpsk":
        # psk.py:173-189: i=x*cos, q=x*(-sin), err=i*q; IIR; PI; out = i
        def step_group(t, carry, g):
            phase, control, iir_x, iir_y, integral = carry[:5]
            x_t, agc_carry = read_x(t, carry, g)
            p, angle = nco(phase, control, g)
            sine = jnp.sin(angle)
            cosine = jnp.cos(angle)
            i_mixer = x_t * cosine
            q_mixer = x_t * (-sine)
            loop_mixer = i_mixer * q_mixer
            y = (pg(3, g) * loop_mixer + pg(3, g) * iir_x) + pg(4, g) * iir_y
            prop = pg(5, g) * y
            integral = jnp.clip(integral + pg(6, g) * (pg(7, g) * y),
                                -pg(8, g), pg(8, g))
            control = prop + integral
            out_ref[sl[g], t, :] = i_mixer
            return (p, control, loop_mixer, y, integral) + agc_carry
    else:
        raise ValueError(kind)

    def step(t, carries):
        return tuple(step_group(t, carries[g], g) for g in range(groups))

    carries = tuple(
        tuple(state_ref[i, sl[g], :] for i in range(n_state))
        for g in range(groups)
    )
    carries = jax.lax.fori_loop(0, tc, step, carries)
    for g in range(groups):
        for i in range(n_state):
            state_ref[i, sl[g], :] = carries[g][i]


@partial(jax.jit, static_argnames=("kind", "wavetable_size", "tc", "rt",
                                   "groups"))
def loop_lanes_pallas(x: jax.Array, lane_params: jax.Array, kind: str,
                      wavetable_size: int = 256, tc: int | None = None,
                      rt: int | None = None, groups: int = 1) -> jax.Array:
    """Run the PLL/Costas loop over (L, T) lanes in one Pallas kernel.

    x: (L, T) float32 independent lanes; lane_params: (10, L) float32 rows
    in _PLL_PARAMS order.  Returns (L, T) demod output (prop term for
    afsk_pll, i_mixer for bpsk), bitwise equal to the vmapped scan path.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    in_dtype = x.dtype
    x = x.astype(jnp.float32)  # the kernels ARE the f32 accelerator path
    L, T = x.shape
    if rt is None or tc is None:
        a_rt, a_tc = auto_tile(L)
        rt = a_rt if rt is None else rt
        tc = a_tc if tc is None else tc
    n_rows = lane_params.shape[0]
    if kind == "agc":
        fuse_agc = False
        assert n_rows == len(_AGC_PARAMS), n_rows
        n_state = 2
    else:
        fuse_agc = n_rows == len(_PLL_PARAMS) + len(_AGC_PARAMS)
        assert fuse_agc or n_rows == len(_PLL_PARAMS), n_rows
        n_state = 7 if fuse_agc else 5
    lanes_per_tile = rt * LANE
    Lp = -(-L // lanes_per_tile) * lanes_per_tile
    Tp = -(-T // tc) * tc
    xp = jnp.pad(x, ((0, Lp - L), (0, Tp - T)))
    pp = jnp.pad(lane_params, ((0, 0), (0, Lp - L)))
    R = Lp // LANE
    # (R, T, 128): lane l = r*128 + c lives at [r, :, c]
    xr = xp.reshape(R, LANE, Tp).transpose(0, 2, 1)
    pr = pp.reshape(n_rows, R, LANE)

    assert rt % groups == 0 and (rt // groups) % 8 == 0, (rt, groups)
    out = pl.pallas_call(
        partial(_loop_kernel, tc=tc, kind=kind,
                wavetable_size=wavetable_size, rt=rt, groups=groups,
                fuse_agc=fuse_agc),
        grid=(R // rt, Tp // tc),
        in_specs=[
            pl.BlockSpec((n_rows, rt, LANE), lambda r, t: (0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, tc, LANE), lambda r, t: (r, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, tc, LANE), lambda r, t: (r, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, Tp, LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_state, rt, LANE), jnp.float32)],
        # off-TPU (CPU tests) the kernel runs in the Pallas interpreter
        interpret=jax.default_backend() != "tpu",
    )(pr, xr)

    return out.transpose(0, 2, 1).reshape(Lp, Tp)[:L, :T].astype(in_dtype)


def _iq_loop_kernel(*refs, tc: int, kind: str, wavetable_size: int, rt: int,
                    groups: int, fuse_agc: bool):
    """qpsk / mpsk kernel: IQ (two-stream) outputs.

    qpsk (psk.py:437-467): one input stream, branch IIRs on the I/Q
    mixers, sign-based phase detector; params rows 10-11 are the branch
    IIR (b0, a1), AGC fusion rows (if any) follow.
    mpsk (psk.py:734-747): two input streams (analytic signal), computed
    QPSK phase detector (phase_detector.py:124-149 formula on the same
    quantized indices as the f64 table gather -- see dsp/loops.py
    _pd_lookup), PI output rounded before use as NCO control; params rows
    10-11 are (pd_gain, pd_granularity); no AGC fusion (the Hilbert FIR
    sits between AGC and loop).
    """
    from jax.experimental import pallas as pl

    n_in = 2 if kind == "mpsk" else 1
    params_ref = refs[0]
    x_refs = refs[1 : 1 + n_in]
    out_i_ref, out_q_ref = refs[1 + n_in : 3 + n_in]
    state_ref = refs[3 + n_in]

    if kind == "qpsk":
        n_state = 11 if fuse_agc else 9
    else:
        n_state = 5
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        z = jnp.zeros((rt, LANE), jnp.float32)
        for i in range(n_state):
            state_ref[i] = z
        state_ref[4] = params_ref[9]  # integral0 (psk.py:703 pre-seed)

    gr = rt // groups
    sl = [slice(g * gr, (g + 1) * gr) for g in range(groups)]

    def pg(i, g):
        return params_ref[i, sl[g], :]

    two_pi = jnp.float32(TWO_PI)
    ang_scale = jnp.float32(TWO_PI / wavetable_size)

    def nco(phase, control, g):
        p = _wrap(phase + pg(0, g) * (pg(1, g) + control), two_pi)
        sine_idx = (p * pg(2, g)).astype(jnp.int32)
        angle = sine_idx.astype(jnp.float32) * ang_scale
        return p, jnp.sin(angle), jnp.cos(angle)

    def agc(x_t, env, sustain, g, base):
        cv = jnp.abs(x_t)
        rising = cv > env
        env = jnp.where(rising, jnp.minimum(env + pg(base, g), cv), env)
        sustain = jnp.where(rising, jnp.zeros_like(sustain), sustain)
        decaying = sustain >= pg(base + 2, g)
        env = jnp.where(decaying,
                        jnp.maximum(env - pg(base + 1, g),
                                    jnp.zeros_like(env)), env)
        sustain = sustain + pg(base + 3, g)
        out = jnp.where(env != 0, pg(base + 4, g) * x_t / env, x_t)
        return out, env, sustain

    if kind == "qpsk":
        def step_group(t, carry, g):
            (phase, control, iir_x, iir_y, integral,
             cos_x, cos_y, sin_x, sin_y) = carry[:9]
            x_t = x_refs[0][sl[g], t, :]
            agc_carry = ()
            if fuse_agc:
                x_t, env, sustain = agc(x_t, carry[9], carry[10], g, 12)
                agc_carry = (env, sustain)
            p, sine, cosine = nco(phase, control, g)
            i_mixer = x_t * cosine
            cos_out = (pg(10, g) * i_mixer + pg(10, g) * cos_x) \
                + pg(11, g) * cos_y
            q_mixer = x_t * sine
            sin_out = (pg(10, g) * q_mixer + pg(10, g) * sin_x) \
                + pg(11, g) * sin_y
            one = jnp.float32(1.0)
            cos_sgn = jnp.where(cos_out >= 0, one, -one)
            sin_sgn = jnp.where(sin_out >= 0, one, -one)
            loop_mixer = (cos_out * sin_sgn) - (sin_out * cos_sgn)
            y = (pg(3, g) * loop_mixer + pg(3, g) * iir_x) + pg(4, g) * iir_y
            prop = pg(5, g) * y
            integral = jnp.clip(integral + pg(6, g) * (pg(7, g) * y),
                                -pg(8, g), pg(8, g))
            control = prop + integral
            out_i_ref[sl[g], t, :] = sin_out
            out_q_ref[sl[g], t, :] = cos_out
            return (p, control, loop_mixer, y, integral,
                    i_mixer, cos_out, q_mixer, sin_out) + agc_carry
    elif kind == "mpsk":
        def step_group(t, carry, g):
            phase, control, iir_x, iir_y, integral = carry
            re = x_refs[0][sl[g], t, :]
            im = x_refs[1][sl[g], t, :]
            p, sine, cosine = nco(phase, control, g)
            out_re = (re * cosine) - (im * (-sine))
            out_im = (cosine * im) + (re * (-sine))
            # computed phase detector (dsp/loops.py _pd_lookup f32 path)
            gf = pg(11, g)
            gi = gf.astype(jnp.int32)
            half = gf * jnp.float32(0.5)
            r = jnp.floor(out_re * half).astype(jnp.int32)
            i = jnp.floor(out_im * half).astype(jnp.int32)
            r = jnp.where(r >= gi, gi - 1, r)
            i = jnp.where(i >= gi, gi - 1, i)
            r = jnp.where(r <= -gi, -(gi - 1), r)
            i = jnp.where(i <= -gi, -(gi - 1), i)
            rn = r >= 0
            inn = i >= 0
            a = jnp.where(rn, jnp.where(inn, r, -i), jnp.where(inn, i, -r))
            b = jnp.where(rn, jnp.where(inn, i, r), jnp.where(inn, -r, -i))
            af = a.astype(jnp.float32)
            bf = b.astype(jnp.float32)
            mag2 = af * af + bf * bf
            gate = (mag2 >= jnp.float32(0.15 * 0.15) * gf * gf) \
                & (mag2 <= jnp.float32(0.76 * 0.76) * gf * gf)
            # first-quadrant atan2 (the fold above leaves a, b >= 0) as an
            # odd minimax polynomial: Mosaic has no atan2 lowering, and the
            # poly's ~1e-7 rad error is below f32 atan2's own rounding at
            # the PD's round() quantization (~4.5 deg steps).  (0, 0) only
            # occurs outside the magnitude gate, where err is forced to 0.
            swap = bf > af
            tq = jnp.where(swap, af, bf) / jnp.where(swap, bf, af)
            s = tq * tq
            atan = tq * (
                jnp.float32(0.99997726) + s * (
                    jnp.float32(-0.33262347) + s * (
                        jnp.float32(0.19354346) + s * (
                            jnp.float32(-0.11643287) + s * (
                                jnp.float32(0.05265332)
                                + s * jnp.float32(-0.01172120))))))
            rad = jnp.where(swap, jnp.float32(np.pi / 2) - atan, atan)
            deg = rad * jnp.float32(180.0 / np.pi)
            err = jnp.round(pg(10, g) * (deg - jnp.float32(45.0)))
            err = jnp.where(gate, err, jnp.float32(0.0))
            y = (pg(3, g) * err + pg(3, g) * iir_x) + pg(4, g) * iir_y
            prop = pg(5, g) * y
            integral = jnp.clip(integral + pg(6, g) * (pg(7, g) * y),
                                -pg(8, g), pg(8, g))
            control = jnp.round(prop + integral)
            out_i_ref[sl[g], t, :] = out_re
            out_q_ref[sl[g], t, :] = out_im
            return (p, control, err, y, integral)
    else:
        raise ValueError(kind)

    def step(t, carries):
        return tuple(step_group(t, carries[g], g) for g in range(groups))

    carries = tuple(
        tuple(state_ref[i, sl[g], :] for i in range(n_state))
        for g in range(groups)
    )
    carries = jax.lax.fori_loop(0, tc, step, carries)
    for g in range(groups):
        for i in range(n_state):
            state_ref[i, sl[g], :] = carries[g][i]


@partial(jax.jit, static_argnames=("kind", "wavetable_size", "tc", "rt",
                                   "groups"))
def iq_loop_lanes_pallas(xs, lane_params: jax.Array, kind: str,
                         wavetable_size: int = 256, tc: int | None = None,
                         rt: int | None = None, groups: int = 1):
    """qpsk/mpsk loop over (L, T) lanes -> (i_data, q_data), each (L, T).

    xs: one (L, T) array for qpsk, a (re, im) pair for mpsk.
    lane_params rows: _PLL_PARAMS + (branch_b0, branch_a1) for qpsk
    (+ _AGC_PARAMS when fused), _PLL_PARAMS + (pd_gain, pd_granularity)
    for mpsk.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xs = (xs,) if not isinstance(xs, (tuple, list)) else tuple(xs)
    in_dtype = xs[0].dtype
    xs = tuple(x.astype(jnp.float32) for x in xs)  # f32 accelerator path
    n_in = len(xs)
    assert n_in == (2 if kind == "mpsk" else 1), (kind, n_in)
    L, T = xs[0].shape
    if rt is None or tc is None:
        a_rt, a_tc = auto_tile(L)
        rt = a_rt if rt is None else rt
        tc = a_tc if tc is None else tc
    n_rows = lane_params.shape[0]
    if kind == "qpsk":
        fuse_agc = n_rows == 12 + len(_AGC_PARAMS)
        assert fuse_agc or n_rows == 12, n_rows
        n_state = 11 if fuse_agc else 9
    else:
        fuse_agc = False
        assert n_rows == 12, n_rows
        n_state = 5
    lanes_per_tile = rt * LANE
    Lp = -(-L // lanes_per_tile) * lanes_per_tile
    Tp = -(-T // tc) * tc
    R = Lp // LANE
    xrs = [
        jnp.pad(x, ((0, Lp - L), (0, Tp - T)))
        .reshape(R, LANE, Tp).transpose(0, 2, 1)
        for x in xs
    ]
    pr = jnp.pad(lane_params, ((0, 0), (0, Lp - L))).reshape(n_rows, R, LANE)

    assert rt % groups == 0 and (rt // groups) % 8 == 0, (rt, groups)
    lane_spec = pl.BlockSpec((rt, tc, LANE), lambda r, t: (r, t, 0),
                             memory_space=pltpu.VMEM)
    out_i, out_q = pl.pallas_call(
        partial(_iq_loop_kernel, tc=tc, kind=kind,
                wavetable_size=wavetable_size, rt=rt, groups=groups,
                fuse_agc=fuse_agc),
        grid=(R // rt, Tp // tc),
        in_specs=[
            pl.BlockSpec((n_rows, rt, LANE), lambda r, t: (0, r, 0),
                         memory_space=pltpu.VMEM),
        ] + [lane_spec] * n_in,
        out_specs=[lane_spec, lane_spec],
        out_shape=[jax.ShapeDtypeStruct((R, Tp, LANE), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((n_state, rt, LANE), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
        # mpsk carries 2 in + 2 out blocks plus the PD temporaries; the
        # default 16 MB scoped-vmem budget overflows by ~20 KB on v5e
        # (auto_tile sizes for the 1-in families).  v5e has 128 MB VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
    )(pr, *xrs)

    def unpack(o):
        return o.transpose(0, 2, 1).reshape(Lp, Tp)[:L, :T].astype(in_dtype)

    return unpack(out_i), unpack(out_q)


def lane_params_from_loop(loop: LoopParams, n_chains: int,
                          blocks_per_chain: int) -> jax.Array:
    """(10, C*B) per-lane parameter rows from stacked (C,)-leaf LoopParams."""
    rows = []
    d = loop._asdict()
    for name in _PLL_PARAMS:
        leaf = jnp.asarray(d[name], jnp.float32).reshape(n_chains)
        rows.append(jnp.repeat(leaf, blocks_per_chain))
    return jnp.stack(rows)


def agc_lane_params(agc_d, normals: jax.Array, n_chains: int,
                    blocks_per_chain: int) -> jax.Array:
    """(5, C*B) AGC fusion rows (_AGC_PARAMS order).  ``normals`` is the
    per-chain whole-recording signed max (agc.py:67) scaling the attack and
    decay steps -- a runtime value, so these rows are built in-graph."""
    normals = jnp.asarray(normals, jnp.float32).reshape(n_chains)
    per_chain = [
        jnp.asarray(agc_d.scaled_attack, jnp.float32).reshape(n_chains) * normals,
        jnp.asarray(agc_d.scaled_decay, jnp.float32).reshape(n_chains) * normals,
        jnp.asarray(agc_d.sustain_time, jnp.float32).reshape(n_chains),
        jnp.asarray(agc_d.sustain_increment, jnp.float32).reshape(n_chains),
        jnp.asarray(agc_d.target, jnp.float32).reshape(n_chains),
    ]
    return jnp.stack([jnp.repeat(r, blocks_per_chain) for r in per_chain])


def use_pallas_loops(dtype) -> bool:
    """Pallas engine applies on the TPU backend at f32 (the accelerator
    dtype); f64 parity runs and CPU tests keep the scan engine."""
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend == "tpu" and jnp.dtype(dtype) == jnp.float32
