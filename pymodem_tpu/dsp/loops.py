"""Carrier-recovery loops (PLL / Costas) as `lax.scan` recurrences.

Each reference modem runs a per-sample Python feedback loop built from an NCO
(wavetable oscillator, nco.py:34-53), a 1st-order IIR loop filter
(iir.py:38-54) and a PI controller (pi_control.py:25-33).  Here each loop is a
single fused scan body with the full carry pytree; banks of chains vmap over
the scan so each step is one wide VPU op per state variable.

Floating-point ordering matters for decision parity, so the step functions
keep the reference's exact operation order:
* proportional term: (gain * p_rate) * x   (pi_control.py:26 evaluates
  left-to-right, so gain*p_rate can be pre-fused)
* integral term:     integral + gain * (i_rate * x)   (pi_control.py:27
  parenthesizes i_rate*x first, so gain must NOT be pre-fused here)
* IIR output:        (b0*x + b1*x_prev) + a1*y_prev   (iir.py:38-54)
* NCO phase wrap by repeated +-2pi, not fmod (nco.py:36-39).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

TWO_PI = 6.283185307179586476925286766559


class LoopParams(NamedTuple):
    """Static per-chain loop constants; array-valued so banks can stack them."""

    wavetable: jax.Array  # (wavetable_size,) NCO sine table
    set_frequency: jax.Array  # () carrier frequency in Hz
    phase_scale: jax.Array  # () 2*pi/sample_rate (nco.py:31)
    index_scale: jax.Array  # () wavetable_size/(2*pi) (nco.py:27)
    iir_b0: jax.Array  # () loop LPF numerator (b1 == b0)
    iir_a1: jax.Array  # () loop LPF denominator
    pi_gp: jax.Array  # () gain * p_rate, pre-fused
    pi_gain: jax.Array  # () gain (kept separate for the integral term)
    pi_i: jax.Array  # () i_rate
    pi_limit: jax.Array  # () integral saturation bound
    pi_integral0: jax.Array  # () initial integral (psk.py:703 for mpsk)


def _wrap_phase(p: jax.Array) -> jax.Array:
    """Wrap into [0, 2pi) by conditional +-2pi, twice each direction.

    The reference uses while-loops (nco.py:36-39); per-step phase increments
    are < 2pi at all supported carrier/control magnitudes, so two rounds
    cover every reachable state.
    """
    two_pi = jnp.asarray(TWO_PI, p.dtype)
    p = jnp.where(p >= two_pi, p - two_pi, p)
    p = jnp.where(p >= two_pi, p - two_pi, p)
    p = jnp.where(p < 0, p + two_pi, p)
    p = jnp.where(p < 0, p + two_pi, p)
    return p


def _nco_step(phase, control, params: LoopParams):
    """One NCO update; returns (new_phase, sine, cosine) (nco.py:34-53).

    The reference looks the quantized phase up in a 256-entry table whose
    entries are exactly ``sin(2*pi*i/size)`` (amplitude is 1.0 in every
    modem, e.g. psk.py:87).  float64 keeps the table gather for bit parity
    with the reference; other dtypes compute sin/cos of the *quantized*
    index directly -- the same quantization semantics, but on TPU a
    transcendental is ~400x cheaper inside a scan than a per-step gather.
    """
    size = params.wavetable.shape[-1]
    phase = _wrap_phase(phase + params.phase_scale * (params.set_frequency + control))
    sine_idx = (phase * params.index_scale).astype(jnp.int32)  # trunc == floor, phase >= 0
    if phase.dtype == jnp.float64:
        cos_idx = jnp.remainder(sine_idx + size // 4, size)
        sine = jnp.take(params.wavetable, sine_idx, axis=-1)
        cosine = jnp.take(params.wavetable, cos_idx, axis=-1)
    else:
        angle = sine_idx.astype(phase.dtype) * jnp.asarray(TWO_PI / size, phase.dtype)
        sine = jnp.sin(angle)
        cosine = jnp.cos(angle)
    return phase, sine, cosine


def _iir_step(x, x_prev, y_prev, b0, a1):
    """1st-order IIR with b1 == b0: y = (b0*x + b0*x_prev) + a1*y_prev."""
    return (b0 * x + b0 * x_prev) + a1 * y_prev


def _pi_step(x, integral, params: LoopParams):
    """PI update_saturate (pi_control.py:25-33): returns (prop, integral)."""
    prop = params.pi_gp * x
    integral = integral + params.pi_gain * (params.pi_i * x)
    integral = jnp.clip(integral, -params.pi_limit, params.pi_limit)
    return prop, integral


def pi_update_reset(x, integral, params: LoopParams):
    """PI update_reset (pi_control.py:16-23): the integral ZEROES on
    overflow instead of saturating.  No reference modem uses this variant
    (SURVEY.md section 2.3); provided for controller-API parity."""
    prop = params.pi_gp * x
    integral = integral + params.pi_gain * (params.pi_i * x)
    integral = jnp.where(jnp.abs(integral) > params.pi_limit,
                         jnp.zeros_like(integral), integral)
    return prop, integral


class _LoopCarry(NamedTuple):
    phase: jax.Array
    control: jax.Array
    iir_x: jax.Array
    iir_y: jax.Array
    integral: jax.Array


def _init_carry(params: LoopParams, dtype) -> _LoopCarry:
    z = jnp.zeros((), dtype)
    return _LoopCarry(z, z, z, z, jnp.asarray(params.pi_integral0, dtype))


@partial(jax.jit, static_argnames=("unroll",))
def afsk_pll(audio: jax.Array, params: LoopParams, unroll: int = 8) -> jax.Array:
    """AFSK PLL demod loop (afsk_pll.py:152-165).

    mixer = x * sine; loop LPF; PI; demod output is the PI *proportional*
    term (afsk_pll.py:163).
    """

    def step(c: _LoopCarry, x):
        phase, sine, _ = _nco_step(c.phase, c.control, params)
        mixer = x * sine
        y = _iir_step(mixer, c.iir_x, c.iir_y, params.iir_b0, params.iir_a1)
        prop, integral = _pi_step(y, c.integral, params)
        control = prop + integral
        return _LoopCarry(phase, control, mixer, y, integral), prop

    _, out = jax.lax.scan(step, _init_carry(params, audio.dtype), audio, unroll=unroll)
    return out


@partial(jax.jit, static_argnames=("unroll",))
def bpsk_costas(audio: jax.Array, params: LoopParams, unroll: int = 8) -> jax.Array:
    """BPSK Costas loop (psk.py:173-189); output is the I-mixer stream.

    NCO.ComplexOutput is (cos, -sin) (nco.py:52-53), so i_mixer = x*cos and
    q_mixer = x*(-sin); loop error = i_mixer * q_mixer.
    """

    def step(c: _LoopCarry, x):
        phase, sine, cosine = _nco_step(c.phase, c.control, params)
        i_mixer = x * cosine
        q_mixer = x * (-sine)
        loop_mixer = i_mixer * q_mixer
        y = _iir_step(loop_mixer, c.iir_x, c.iir_y, params.iir_b0, params.iir_a1)
        prop, integral = _pi_step(y, c.integral, params)
        control = prop + integral
        return _LoopCarry(phase, control, loop_mixer, y, integral), i_mixer

    _, out = jax.lax.scan(step, _init_carry(params, audio.dtype), audio, unroll=unroll)
    return out


class QPSKLoopParams(NamedTuple):
    base: LoopParams
    branch_b0: jax.Array  # I/Q branch IIR numerator
    branch_a1: jax.Array  # I/Q branch IIR denominator


class _QPSKCarry(NamedTuple):
    loop: _LoopCarry
    cos_x: jax.Array
    cos_y: jax.Array
    sin_x: jax.Array
    sin_y: jax.Array


@partial(jax.jit, static_argnames=("unroll",))
def qpsk_costas(audio: jax.Array, params: QPSKLoopParams, unroll: int = 8):
    """QPSK Costas loop with branch IIRs (psk.py:437-467).

    Emits (i_data, q_data) where i_data is the *sine*-branch LPF output and
    q_data the cosine-branch output, matching psk.py:453-454.
    """
    base = params.base

    def step(c: _QPSKCarry, x):
        lc = c.loop
        phase, sine, cosine = _nco_step(lc.phase, lc.control, base)
        i_mixer = x * cosine
        cos_out = _iir_step(i_mixer, c.cos_x, c.cos_y, params.branch_b0, params.branch_a1)
        q_mixer = x * sine
        sin_out = _iir_step(q_mixer, c.sin_x, c.sin_y, params.branch_b0, params.branch_a1)
        one = jnp.ones((), x.dtype)
        cos_sgn = jnp.where(cos_out >= 0, one, -one)
        sin_sgn = jnp.where(sin_out >= 0, one, -one)
        loop_mixer = (cos_out * sin_sgn) - (sin_out * cos_sgn)
        y = _iir_step(loop_mixer, lc.iir_x, lc.iir_y, base.iir_b0, base.iir_a1)
        prop, integral = _pi_step(y, lc.integral, base)
        control = prop + integral
        carry = _QPSKCarry(
            _LoopCarry(phase, control, loop_mixer, y, integral),
            i_mixer, cos_out, q_mixer, sin_out,
        )
        return carry, (sin_out, cos_out)

    z = jnp.zeros((), audio.dtype)
    init = _QPSKCarry(_init_carry(base, audio.dtype), z, z, z, z)
    _, (i_data, q_data) = jax.lax.scan(step, init, audio, unroll=unroll)
    return i_data, q_data


class MPSKLoopParams(NamedTuple):
    base: LoopParams
    pd_table: jax.Array  # (granularity, granularity) int32 QPSK error table
    pd_granularity: jax.Array  # () int32
    pd_gain: jax.Array  # () phase-detector gain (table build constant)


def _pd_lookup(real, imag, table, granularity, gain):
    """Table-driven QPSK phase detector (phase_detector.py:124-149).

    Quantize by floor(v * granularity/2), clamp to +-(granularity-1), then
    quadrant-fold into the first-quadrant table.  float64 gathers from the
    table for bit parity; other dtypes compute the table's own formula --
    round(gain*(atan2_deg(b,a)-45)) gated on magnitude -- on the SAME
    quantized indices (a per-step gather inside a scan is far slower than
    the transcendental on TPU; see _nco_step).
    """
    g = granularity
    half = g.astype(real.dtype) * jnp.asarray(0.5, real.dtype)
    r = jnp.floor(real * half).astype(jnp.int32)
    i = jnp.floor(imag * half).astype(jnp.int32)
    r = jnp.where(r >= g, g - 1, r)
    i = jnp.where(i >= g, g - 1, i)
    r = jnp.where(r <= -g, -(g - 1), r)
    i = jnp.where(i <= -g, -(g - 1), i)
    r_nonneg = r >= 0
    i_nonneg = i >= 0
    a = jnp.where(r_nonneg, jnp.where(i_nonneg, r, -i), jnp.where(i_nonneg, i, -r))
    b = jnp.where(r_nonneg, jnp.where(i_nonneg, i, r), jnp.where(i_nonneg, -r, -i))
    if real.dtype == jnp.float64:
        flat = a * g + b
        return jnp.take(table.reshape(-1), flat, axis=-1)
    af = a.astype(real.dtype)
    bf = b.astype(real.dtype)
    mag2 = af * af + bf * bf
    gf = g.astype(real.dtype)
    gate = (mag2 >= (0.15 * 0.15) * gf * gf) & (mag2 <= (0.76 * 0.76) * gf * gf)
    deg = jnp.arctan2(bf, af) * jnp.asarray(180.0 / jnp.pi, real.dtype)
    err = jnp.round(gain * (deg - 45.0))
    return jnp.where(gate, err, 0.0).astype(jnp.int32)


@partial(jax.jit, static_argnames=("unroll",))
def mpsk_loop(real_audio: jax.Array, imag_audio: jax.Array, params: MPSKLoopParams,
              unroll: int = 8):
    """MPSK analytic-signal loop (psk.py:734-747).

    Rotates the Hilbert analytic sample by the NCO conjugate carrier
    (complexmath.py:15-19 ordering), drives the loop filter with the
    table phase detector, and rounds the PI output before applying it as the
    NCO control (psk.py:740, Python banker's rounding == jnp.round).
    Emits the rotated (i, q) streams.
    """
    base = params.base

    def step(c: _LoopCarry, xs):
        re, im = xs
        phase, sine, cosine = _nco_step(c.phase, c.control, base)
        # ComplexNumber.multiply with arg = (cos, -sin):
        out_re = (re * cosine) - (im * (-sine))
        out_im = (cosine * im) + (re * (-sine))
        err = _pd_lookup(out_re, out_im, params.pd_table,
                         params.pd_granularity, params.pd_gain)
        y = _iir_step(err.astype(re.dtype), c.iir_x, c.iir_y, base.iir_b0, base.iir_a1)
        prop, integral = _pi_step(y, c.integral, base)
        control = jnp.round(prop + integral)
        return _LoopCarry(phase, control, err.astype(re.dtype), y, integral), (out_re, out_im)

    init = _init_carry(base, real_audio.dtype)
    _, (i_data, q_data) = jax.lax.scan(step, init, (real_audio, imag_audio), unroll=unroll)
    return i_data, q_data
