"""Modem forward passes: audio -> baseband (or IQ) on device.

Each family is (params builder, demod function).  Params are numpy arrays
built once on host from the spec (tap design etc.); demod functions are pure
JAX and dtype-polymorphic (float64 for CPU parity runs, float32/bfloat16 on
TPU).  Stage structure per family mirrors the reference call stacks
(SURVEY.md section 3) while the execution strategy is TPU-native: bulk FIRs
as (FFT) convolutions, sequential loops as fused scans.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .config import (
    AFSKModemSpec,
    AFSKPLLModemSpec,
    AGCSpec,
    BPSKModemSpec,
    FSKModemSpec,
    MPSKModemSpec,
    QPSKModemSpec,
)
from .dsp import window_design as wd
from .dsp.agc import agc_apply
from .dsp.fir import afsk_correlate, fir_valid
from .dsp.loops import (
    LoopParams,
    MPSKLoopParams,
    QPSKLoopParams,
    afsk_pll,
    bpsk_costas,
    mpsk_loop,
    qpsk_costas,
)

TWO_PI = 2.0 * np.pi


def _round_taps(rate: float, span: float, per: float) -> int:
    """Tap count = round(rate * span / per) with Python banker's rounding,
    as used by every reference tune() (e.g. afsk.py:103-108)."""
    return round(rate * span / per)


class AGCParams(NamedTuple):
    scaled_attack: np.float64
    scaled_decay: np.float64
    sustain_time: np.float64
    sustain_increment: np.float64
    target: np.float64


def _agc_params(spec: AGCSpec, sample_rate: float) -> AGCParams:
    return AGCParams(
        np.float64(spec.attack_rate / sample_rate),
        np.float64(spec.decay_rate / sample_rate),
        np.float64(spec.sustain_time),
        np.float64(1.0 / sample_rate),
        np.float64(spec.target_amplitude),
    )


def _loop_params(spec, dtype, integral_init: float | None = None) -> LoopParams:
    b0, a1 = wd.iir1_lpf_coefs(spec.sample_rate, spec.loop_lpf_cutoff, 1.0)
    pi = spec.pi
    return LoopParams(
        wavetable=jnp.asarray(wd.nco_wavetable(256, 1.0), dtype),
        set_frequency=jnp.asarray(spec.carrier_freq, dtype),
        phase_scale=jnp.asarray(TWO_PI / spec.sample_rate, dtype),
        index_scale=jnp.asarray(256.0 / TWO_PI, dtype),
        iir_b0=jnp.asarray(b0, dtype),
        iir_a1=jnp.asarray(a1, dtype),
        pi_gp=jnp.asarray(pi.gain * pi.p, dtype),
        pi_gain=jnp.asarray(pi.gain, dtype),
        pi_i=jnp.asarray(pi.i, dtype),
        pi_limit=jnp.asarray(pi.i_limit, dtype),
        pi_integral0=jnp.asarray(
            pi.integral_init if integral_init is None else integral_init, dtype
        ),
    )


def _loop_params_host(spec, integral_init: float | None = None) -> LoopParams:
    """Numpy (host) variant of _loop_params, for bank stacking: one device
    transfer per stacked pytree instead of one per leaf."""
    b0, a1 = wd.iir1_lpf_coefs(spec.sample_rate, spec.loop_lpf_cutoff, 1.0)
    pi = spec.pi
    return LoopParams(
        wavetable=wd.nco_wavetable(256, 1.0),
        set_frequency=np.float64(spec.carrier_freq),
        phase_scale=np.float64(TWO_PI / spec.sample_rate),
        index_scale=np.float64(256.0 / TWO_PI),
        iir_b0=np.float64(b0),
        iir_a1=np.float64(a1),
        pi_gp=np.float64(pi.gain * pi.p),
        pi_gain=np.float64(pi.gain),
        pi_i=np.float64(pi.i),
        pi_limit=np.float64(pi.i_limit),
        pi_integral0=np.float64(
            pi.integral_init if integral_init is None else integral_init
        ),
    )


def _apply_agc(audio, agc: AGCParams):
    return agc_apply(
        audio,
        jnp.asarray(agc.scaled_attack, audio.dtype),
        jnp.asarray(agc.scaled_decay, audio.dtype),
        jnp.asarray(agc.sustain_time, audio.dtype),
        jnp.asarray(agc.sustain_increment, audio.dtype),
        jnp.asarray(agc.target, audio.dtype),
    )


# ---------------------------------------------------------------------------
# AFSK tone correlator (afsk.py:148-167)
# ---------------------------------------------------------------------------


class AFSKParams(NamedTuple):
    input_bpf: np.ndarray
    output_lpf: np.ndarray
    mark_i: np.ndarray
    mark_q: np.ndarray
    space_i: np.ndarray
    space_q: np.ndarray
    # polyphase upsample filter for output_oversample > 1 (afsk.py:164-165);
    # zero-length array when the branch is off (the common case)
    resample_taps: np.ndarray = np.zeros(0)
    oversample: int = 1


def _resample_poly_taps(up: int) -> np.ndarray:
    """The exact anti-imaging filter scipy.signal.resample_poly(x, up, 1)
    designs internally: kaiser(beta=5.0)-windowed sinc, cutoff 1/up,
    2*10*up+1 taps, scaled by up."""
    from scipy.signal import firwin

    half_len = 10 * up
    return up * firwin(2 * half_len + 1, 1.0 / up, window=("kaiser", 5.0))


def afsk_params(spec: AFSKModemSpec) -> AFSKParams:
    n_in = _round_taps(spec.sample_rate, spec.input_bpf_span, spec.symbol_rate)
    # tap counts derive from the OUTPUT rate for the post-resample LPF
    # (afsk.py:103-108 uses self.sample_rate; with oversample they act on the
    # upsampled stream, and the reference computes them from sample_rate --
    # we keep its arithmetic exactly)
    n_out = _round_taps(spec.sample_rate, spec.output_lpf_span, spec.symbol_rate)
    mark_i, mark_q, space_i, space_q = wd.tone_correlators(
        spec.sample_rate, spec.symbol_rate, spec.correlator_span,
        spec.mark_freq, spec.space_freq, spec.space_gain, spec.correlator_offset,
    )
    oversample = int(spec.output_oversample)
    return AFSKParams(
        input_bpf=wd.bandpass_taps(
            n_in, spec.input_bpf_low_cutoff, spec.input_bpf_high_cutoff, spec.sample_rate
        ),
        output_lpf=wd.lowpass_taps(n_out, spec.output_lpf_cutoff, spec.sample_rate),
        mark_i=mark_i, mark_q=mark_q, space_i=space_i, space_q=space_q,
        resample_taps=(
            _resample_poly_taps(oversample) if oversample > 1 else np.zeros(0)
        ),
        oversample=oversample,
    )


def _upsample_poly(x, taps, up: int):
    """jnp equivalent of scipy.signal.resample_poly(x, up, 1): zero-stuff to
    n*up, centered FIR with the kaiser anti-imaging filter.  Output length
    n*up, matching scipy's trim (signaltools: n_pre_remove=(len(h)-1)//2)."""
    n = x.shape[-1]
    stuffed = jnp.zeros(x.shape[:-1] + (n * up,), x.dtype)
    stuffed = stuffed.at[..., ::up].set(x)
    h = jnp.asarray(taps, x.dtype)
    # taps are odd (2*10*up+1): 'valid' conv of the half-padded stream
    # equals scipy's centered full-conv trim y_full[half : half + n*up]
    half = (h.shape[-1] - 1) // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(half, half)]
    return fir_valid(jnp.pad(stuffed, pad), h, "auto")


def afsk_demod(params: AFSKParams, audio, method: str = "auto"):
    dtype = audio.dtype
    filtered = fir_valid(audio, jnp.asarray(params.input_bpf, dtype), method)
    diff = afsk_correlate(
        filtered,
        jnp.asarray(params.mark_i, dtype), jnp.asarray(params.mark_q, dtype),
        jnp.asarray(params.space_i, dtype), jnp.asarray(params.space_q, dtype),
        method,
    )
    if params.oversample > 1:
        diff = _upsample_poly(diff, params.resample_taps, params.oversample)
    return fir_valid(diff, jnp.asarray(params.output_lpf, dtype), method)


# ---------------------------------------------------------------------------
# AFSK PLL (afsk_pll.py:140-170)
# ---------------------------------------------------------------------------


class PLLParams(NamedTuple):
    input_bpf: np.ndarray
    output_lpf: np.ndarray
    agc: AGCParams


def afsk_pll_params(spec: AFSKPLLModemSpec) -> PLLParams:
    n_in = _round_taps(spec.sample_rate, spec.input_bpf_span, spec.symbol_rate)
    n_out = _round_taps(spec.sample_rate, spec.output_lpf_span, spec.symbol_rate)
    return PLLParams(
        input_bpf=wd.bandpass_taps(
            n_in, spec.input_bpf_low_cutoff, spec.input_bpf_high_cutoff,
            spec.sample_rate, scale=True,
        ),
        output_lpf=wd.lowpass_taps(n_out, spec.output_lpf_cutoff, spec.sample_rate),
        agc=_agc_params(spec.agc, spec.sample_rate),
    )


def afsk_pll_demod(spec: AFSKPLLModemSpec, params: PLLParams, audio,
                   method: str = "auto", unroll: int = 8):
    dtype = audio.dtype
    filtered = fir_valid(audio, jnp.asarray(params.input_bpf, dtype), method)
    leveled = _apply_agc(filtered, params.agc)
    demod = afsk_pll(leveled, _loop_params(spec, dtype), unroll=unroll)
    return fir_valid(demod, jnp.asarray(params.output_lpf, dtype), method)


# ---------------------------------------------------------------------------
# BPSK Costas (psk.py:162-195)
# ---------------------------------------------------------------------------


class PSKParams(NamedTuple):
    input_bpf: np.ndarray
    rrc: np.ndarray
    agc: AGCParams


def bpsk_params(spec: BPSKModemSpec) -> PSKParams:
    n_in = _round_taps(spec.sample_rate, spec.input_bpf_span, spec.symbol_rate)
    return PSKParams(
        input_bpf=wd.bandpass_taps(
            n_in, spec.input_bpf_low_cutoff, spec.input_bpf_high_cutoff,
            spec.sample_rate, scale=True,
        ),
        rrc=wd.rrc_taps(spec.sample_rate, spec.symbol_rate, spec.rrc_span,
                        spec.rrc_rolloff_rate),
        agc=_agc_params(spec.agc, spec.sample_rate),
    )


def bpsk_demod(spec: BPSKModemSpec, params: PSKParams, audio,
               method: str = "auto", unroll: int = 8):
    dtype = audio.dtype
    filtered = fir_valid(audio, jnp.asarray(params.input_bpf, dtype), method)
    leveled = _apply_agc(filtered, params.agc)
    demod = bpsk_costas(leveled, _loop_params(spec, dtype), unroll=unroll)
    return fir_valid(demod, jnp.asarray(params.rrc, dtype), method)


# ---------------------------------------------------------------------------
# QPSK Costas with branch IIRs (psk.py:425-476)
# ---------------------------------------------------------------------------


def qpsk_params(spec: QPSKModemSpec) -> PSKParams:
    n_in = _round_taps(spec.sample_rate, spec.input_bpf_span, spec.symbol_rate)
    return PSKParams(
        input_bpf=wd.bandpass_taps(
            n_in, spec.input_bpf_low_cutoff, spec.input_bpf_high_cutoff,
            spec.sample_rate, scale=True,
        ),
        rrc=wd.rrc_taps(spec.sample_rate, spec.symbol_rate, spec.rrc_span,
                        spec.rrc_rolloff_rate),
        agc=_agc_params(spec.agc, spec.sample_rate),
    )


def qpsk_demod(spec: QPSKModemSpec, params: PSKParams, audio,
               method: str = "auto", unroll: int = 8):
    dtype = audio.dtype
    filtered = fir_valid(audio, jnp.asarray(params.input_bpf, dtype), method)
    leveled = _apply_agc(filtered, params.agc)
    bb0, ba1 = wd.iir1_lpf_coefs(spec.sample_rate, spec.branch_lpf_cutoff, 1.0)
    loop = QPSKLoopParams(
        base=_loop_params(spec, dtype),
        branch_b0=jnp.asarray(bb0, dtype),
        branch_a1=jnp.asarray(ba1, dtype),
    )
    i_data, q_data = qpsk_costas(leveled, loop, unroll=unroll)
    rrc = jnp.asarray(params.rrc, dtype)
    return fir_valid(i_data, rrc, method), fir_valid(q_data, rrc, method)


# ---------------------------------------------------------------------------
# MPSK on the analytic signal (psk.py:705-773)
# ---------------------------------------------------------------------------


class MPSKParams(NamedTuple):
    input_bpf: np.ndarray
    rrc: np.ndarray
    hilbert: np.ndarray
    hilbert_delay: int
    pd_table: np.ndarray
    agc: AGCParams


def mpsk_params(spec: MPSKModemSpec) -> MPSKParams:
    n_in = _round_taps(spec.sample_rate, spec.input_bpf_span_ms, 1000.0)
    n_hilbert = _round_taps(spec.sample_rate, spec.hilbert_span_ms, 1000.0)
    if n_hilbert % 2 == 0:
        n_hilbert += 1  # psk.py:661-665
    return MPSKParams(
        input_bpf=wd.bandpass_taps(
            n_in, spec.input_bpf_low_cutoff, spec.input_bpf_high_cutoff,
            spec.sample_rate, scale=True,
        ),
        rrc=wd.rrc_taps(spec.sample_rate, spec.symbol_rate, spec.rrc_span,
                        spec.rrc_rolloff_rate),
        hilbert=wd.hilbert_taps(n_hilbert),
        hilbert_delay=n_hilbert // 2,
        pd_table=wd.qpsk_error_table(spec.pd_granularity, spec.pd_gain),
        agc=_agc_params(spec.agc, spec.sample_rate),
    )


def mpsk_demod(spec: MPSKModemSpec, params: MPSKParams, audio,
               method: str = "auto", unroll: int = 8):
    dtype = audio.dtype
    filtered = fir_valid(audio, jnp.asarray(params.input_bpf, dtype), method)
    leveled = _apply_agc(filtered, params.agc)
    imag = fir_valid(leveled, jnp.asarray(params.hilbert, dtype), method)
    # The real path is a pure delay then tail trim (psk.py:714-716): a valid
    # convolution with a unit impulse of length delay+1 selects
    # leveled[delay:], and the [:-delay] trim aligns it with the imag path.
    d = params.hilbert_delay
    real = leveled[d:-d] if d else leveled
    loop = MPSKLoopParams(
        base=_loop_params(spec, dtype),
        pd_table=jnp.asarray(params.pd_table),
        pd_granularity=jnp.asarray(spec.pd_granularity, jnp.int32),
        pd_gain=jnp.asarray(spec.pd_gain, dtype),
    )
    i_data, q_data = mpsk_loop(real, imag, loop, unroll=unroll)
    rrc = jnp.asarray(params.rrc, dtype)
    return fir_valid(i_data, rrc, method), fir_valid(q_data, rrc, method)


# ---------------------------------------------------------------------------
# FSK (fsk.py:149-159)
# ---------------------------------------------------------------------------


class FSKParams(NamedTuple):
    input_lpf: np.ndarray
    invert: bool


def fsk_params(spec: FSKModemSpec) -> FSKParams:
    if spec.input_filter_type == "rrc":
        taps = wd.rrc_taps(spec.sample_rate, spec.symbol_rate, spec.input_lpf_span,
                           spec.rrc_rolloff_rate)
    else:
        n = _round_taps(spec.sample_rate, spec.input_lpf_span, spec.symbol_rate)
        taps = wd.lowpass_taps(n, spec.input_lpf_cutoff, spec.sample_rate)
    return FSKParams(input_lpf=taps, invert=spec.invert)


def fsk_demod(params: FSKParams, audio, method: str = "auto"):
    out = fir_valid(audio, jnp.asarray(params.input_lpf, audio.dtype), method)
    return -out if params.invert else out


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def build_params(spec):
    return {
        "afsk": afsk_params,
        "afsk_pll": afsk_pll_params,
        "bpsk": bpsk_params,
        "qpsk": qpsk_params,
        "mpsk": mpsk_params,
        "fsk": fsk_params,
    }[spec.kind](spec)


def demod(spec, params, audio, method: str = "auto", unroll: int = 8):
    """Returns baseband (N,) for real modems or an (i, q) tuple for IQ ones."""
    kind = spec.kind
    if kind == "afsk":
        return afsk_demod(params, audio, method)
    if kind == "afsk_pll":
        return afsk_pll_demod(spec, params, audio, method, unroll)
    if kind == "bpsk":
        return bpsk_demod(spec, params, audio, method, unroll)
    if kind == "qpsk":
        return qpsk_demod(spec, params, audio, method, unroll)
    if kind == "mpsk":
        return mpsk_demod(spec, params, audio, method, unroll)
    if kind == "fsk":
        return fsk_demod(params, audio, method)
    raise ValueError(kind)
