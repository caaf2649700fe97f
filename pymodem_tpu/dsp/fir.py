"""Bulk FIR filtering on device.

The reference applies every FIR with ``numpy.convolve(x, taps, 'valid')``
(afsk.py:151-166, psk.py:165/193, fsk.py:151).  Each stage therefore shortens
the stream by ``len(taps) - 1`` samples; stream addresses downstream count the
*shortened* stream, so the trim arithmetic here is parity-relevant.

Two execution strategies:

* ``direct``: jnp.convolve / conv_general_dilated -- float64 CPU parity runs
  (bit-identical summation order to numpy.convolve).
* ``fft``: overlap-save convolution with short FFTs (size ~4x taps): the
  signal is framed into hops of ``F - T + 1`` samples, each frame convolved
  in the frequency domain, wrap-around regions discarded.  Memory stays
  ~2.4x the signal regardless of length (a full-length FFT of a long block
  padded to a power of two OOMs HBM and is FLOP-wasteful).
* ``shift`` (auto for <= 32 taps): t fused shift-multiply-adds on the VPU.
* ``matmul`` (auto for > 32 taps): banded-Toeplitz matmul on the MXU --
  ~5x the fft path at the 67-187 tap counts this workload uses.

(A Pallas tiled-VPU conv existed through round 1 but measured 13x slower
than the matmul engine and was removed; the Pallas effort lives where the
XLA path is actually weak -- the recurrent loops, dsp/pallas_loops.py.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def _os_frame(x: jax.Array, t: int) -> tuple[jax.Array, int, int]:
    """Frame (..., n) for overlap-save with tap count t.

    Returns (frames (..., nf, F), F, nout); frame k holds input
    [k*H, k*H + F) zero-padded at the tail, H = F - t + 1.
    """
    n = x.shape[-1]
    nout = n - t + 1
    fft_size = _next_pow2(max(4 * t, 512))
    hop = fft_size - t + 1
    nf = -(-nout // hop)
    pad = nf * hop + t - 1 - n
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, max(pad, 0))])
    # iota-built gather indices: an np constant would be baked into the
    # executable as a multi-MB literal and dominate program-load time
    idx = (
        jnp.arange(nf, dtype=jnp.int32)[:, None] * hop
        + jnp.arange(fft_size, dtype=jnp.int32)[None, :]
    )
    frames = jnp.take(xp, idx, axis=-1)
    return frames, fft_size, nout


def fir_valid(x: jax.Array, taps: jax.Array, method: str = "auto") -> jax.Array:
    """'valid'-mode convolution of a 1-D signal with FIR taps.

    out[k] = sum_j x[k + T - 1 - j] * taps[j]  (numpy.convolve semantics,
    kernel flipped), with output length len(x) - len(taps) + 1.
    """
    n = x.shape[-1]
    t = taps.shape[-1]
    if method == "auto":
        # f64 (CPU parity) -> direct, matching numpy.convolve bit-for-bit.
        # Otherwise FFT: on this TPU XLA's direct conv lowering takes minutes
        # to *compile* for long signals, while the rfft path compiles in
        # seconds and runs at HBM roofline.
        method = "direct" if x.dtype == jnp.float64 else "fft"
    if method == "direct":
        return jnp.convolve(x, taps, mode="valid")
    return fir_valid_nd(x, taps, "fft")


def _conv_precision():
    """MXU pass count for the f32 Toeplitz conv: HIGHEST (6-pass bf16,
    exact-f32-equivalent) by default -- the TPU's reduced-precision f32
    matmul passes flip bit-marginal slicer decisions in noise.  HIGH
    (3 passes, ~2x faster) is selectable for throughput experiments via
    PYMODEM_TPU_CONV_PRECISION=high; packet-set parity on the bundled
    fixture must be re-verified whenever it is used."""
    import os

    lvl = os.environ.get("PYMODEM_TPU_CONV_PRECISION", "highest").lower()
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[lvl]


def fir_valid_nd(x: jax.Array, taps: jax.Array, method: str = "auto") -> jax.Array:
    """'valid' convolution over the last axis of a batched signal.

    x: (..., n); taps: (t,) shared across the batch.  ``direct`` lowers to the
    same conv_general_dilated op as jnp.convolve, so per-element summation
    order (and hence float results) matches the 1-D path bit-for-bit --
    required for block-parallel vs sequential decision parity.
    """
    n = x.shape[-1]
    t = taps.shape[-1]
    if method == "auto":
        if x.dtype == jnp.float64:
            method = "direct"
        elif t <= 8:
            # very short taps (the 7-8 tap AFSK tone correlators): t fused
            # shift-multiply-adds beat the 128-wide banded matmul.  The
            # threshold is 8, not 32: XLA materializes the t shifted
            # products as full-size HLO temps inside grouped while-loops
            # (observed 16 x 1.03 GB for the 15-tap FSK gauss LPF over a
            # (8,128,269k) block group -- v5e OOM), so mid-length taps are
            # cheaper AND ~t x leaner on the MXU band.
            method = "shift"
        else:
            # banded-Toeplitz matmul on the MXU: ~5x the overlap-save FFT
            # path at the 67-187 tap counts this workload uses
            method = "matmul"
    if method == "shift":
        nout = n - t + 1
        acc = taps[..., t - 1] * x[..., 0:nout]
        for j in range(t - 1):
            acc = acc + taps[..., j] * x[..., t - 1 - j : t - 1 - j + nout]
        return acc
    if method == "matmul":
        return _matmul_conv(x, taps)
    if method == "direct":
        batch = x.shape[:-1]
        lhs = x.reshape(-1, 1, n)  # (N, C=1, W)
        rhs = taps[::-1].reshape(1, 1, t)  # (O=1, I=1, W) flipped: convolution
        out = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return out.reshape(*batch, n - t + 1)
    frames, fft_size, nout = _os_frame(x, t)
    hop = fft_size - t + 1
    fx = jnp.fft.rfft(frames, fft_size)
    fh = jnp.fft.rfft(taps, fft_size)
    seg = jnp.fft.irfft(fx * fh, fft_size)[..., t - 1 : t - 1 + hop]
    out = seg.reshape(*x.shape[:-1], -1)[..., :nout]
    return out.astype(x.dtype)


_MM_TILE = 128


def _matmul_conv(x: jax.Array, taps: jax.Array) -> jax.Array:
    """Valid convolution as a banded-Toeplitz matmul on the MXU.

    The signal is framed into 128-sample output tiles with a (t-1)-sample
    halo; each tile's outputs are one (K, 128) matmul against a banded
    matrix built from the taps (T[k, o] = taps[t-1-(k-o)]).  FLOPs are
    ~(128+t)*2 per sample -- higher than direct -- but they run on the
    systolic array, which beats both the VPU shift-MAC chain and the
    XLA FFT path by an order of magnitude at bench shapes.
    """
    t = taps.shape[-1]
    n = x.shape[-1]
    nout = n - t + 1
    k_len = _MM_TILE + t - 1
    n_tiles = -(-nout // _MM_TILE)
    # frames via shifted reshapes (pure layout ops, no gather): window i is
    # the concatenation of consecutive 128-sample tiles starting at tile i
    m = -(-k_len // _MM_TILE)
    total_tiles = n_tiles + m
    pad = total_tiles * _MM_TILE - n
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, max(pad, 0))])
    xr = xp.reshape(*x.shape[:-1], total_tiles, _MM_TILE)
    frames = jnp.concatenate(
        [xr[..., s : s + n_tiles, :] for s in range(m)], axis=-1
    )[..., :k_len]  # (..., n_tiles, K)
    kk = jnp.arange(k_len, dtype=jnp.int32)[:, None]
    oo = jnp.arange(_MM_TILE, dtype=jnp.int32)[None, :]
    tap_idx = t - 1 - (kk - oo)
    band = jnp.where(
        (tap_idx >= 0) & (tap_idx < t),
        jnp.take(taps, jnp.clip(tap_idx, 0, t - 1), axis=-1),
        0.0,
    )  # (K, TILE)
    y = jnp.matmul(frames, band, preferred_element_type=jnp.float32,
                   precision=_conv_precision())
    return y.reshape(*x.shape[:-1], n_tiles * _MM_TILE)[..., :nout].astype(x.dtype)


def fir_valid_multi(x: jax.Array, taps_stack: jax.Array,
                    method: str = "auto") -> jax.Array:
    """Valid convolution of one signal with K tap sets in one pass.

    x: (..., n); taps_stack: (K, t) -> (K, ..., n-t+1).  ``matmul`` (the
    accelerator default) builds the Toeplitz frames once and multiplies
    against all K banded matrices side by side -- the AFSK mark/space
    correlator quad is a single MXU matmul.  ``fft`` shares one rfft of the
    signal across the K tap spectra; ``direct`` (f64 parity) falls back to
    per-tap convolution.
    """
    k, t = taps_stack.shape
    if method == "auto":
        if x.dtype == jnp.float64:
            method = "direct"
        elif t <= 8:
            # the 7-8 tap AFSK tone correlators: the banded matmul pads
            # the band to a 128-wide tile, ~17x the FLOPs of t
            # shift-multiply-adds -- measured 0.7 s vs 0.1 s on the
            # 64-chain bench hour.  Longer taps go to the matmul (see
            # fir_valid_nd: the shift products materialize as full-size
            # HLO temps in grouped programs).
            method = "shift"
        else:
            method = "matmul"
    if method == "matmul":
        # one matmul for all K tap sets: shared frames, bands side by side
        t_ = taps_stack.shape[-1]
        n = x.shape[-1]
        nout = n - t_ + 1
        k_len = _MM_TILE + t_ - 1
        n_tiles = -(-nout // _MM_TILE)
        m = -(-k_len // _MM_TILE)
        total_tiles = n_tiles + m
        pad = total_tiles * _MM_TILE - n
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, max(pad, 0))])
        xr = xp.reshape(*x.shape[:-1], total_tiles, _MM_TILE)
        frames = jnp.concatenate(
            [xr[..., s : s + n_tiles, :] for s in range(m)], axis=-1
        )[..., :k_len]
        kk = jnp.arange(k_len, dtype=jnp.int32)[:, None]
        oo = jnp.arange(_MM_TILE, dtype=jnp.int32)[None, :]
        tap_idx = t_ - 1 - (kk - oo)
        sel = (tap_idx >= 0) & (tap_idx < t_)
        bands = jnp.where(
            sel[None],
            jnp.take(taps_stack, jnp.clip(tap_idx, 0, t_ - 1), axis=-1),
            0.0,
        )  # (K_sets, k_len, TILE)
        band = jnp.concatenate([bands[i] for i in range(k)], axis=-1)
        y = jnp.matmul(frames, band, preferred_element_type=jnp.float32,
                       precision=_conv_precision())
        # (..., n_tiles, K_sets*TILE) -> (K_sets, ..., nout)
        y = y.reshape(*x.shape[:-1], n_tiles, k, _MM_TILE)
        y = jnp.moveaxis(y, -2, 0)
        return y.reshape((k,) + x.shape[:-1] + (n_tiles * _MM_TILE,))[
            ..., :nout
        ].astype(x.dtype)
    if method in ("direct", "shift"):
        return jnp.stack([fir_valid_nd(x, taps_stack[i], method) for i in range(k)])
    frames, fft_size, nout = _os_frame(x, t)
    hop = fft_size - t + 1
    fx = jnp.fft.rfft(frames, fft_size)  # (..., nf, Fr)
    fh = jnp.fft.rfft(taps_stack, fft_size)  # (K, Fr)
    fh = fh.reshape((k,) + (1,) * (frames.ndim - 1) + (fh.shape[-1],))
    seg = jnp.fft.irfft(fx[None] * fh, fft_size)[..., t - 1 : t - 1 + hop]
    out = seg.reshape((k,) + x.shape[:-1] + (-1,))[..., :nout]
    return out.astype(x.dtype)


def fir_valid_batch(x: jax.Array, taps: jax.Array, method: str = "auto") -> jax.Array:
    """Batched valid FIR: x (..., N) with shared taps (T,) or per-row (..., T)."""
    if taps.ndim == 1:
        return jax.vmap(lambda row: fir_valid(row, taps, method))(
            x.reshape(-1, x.shape[-1])
        ).reshape(x.shape[:-1] + (x.shape[-1] - taps.shape[-1] + 1,))
    flat_x = x.reshape(-1, x.shape[-1])
    flat_t = taps.reshape(-1, taps.shape[-1])
    out = jax.vmap(lambda row, h: fir_valid(row, h, method))(flat_x, flat_t)
    return out.reshape(x.shape[:-1] + (out.shape[-1],))


def afsk_correlate(audio: jax.Array, mark_i: jax.Array, mark_q: jax.Array,
                   space_i: jax.Array, space_q: jax.Array,
                   method: str = "auto") -> jax.Array:
    """Mark/space quadrature tone correlation: mark_mag - space_mag.

    Fuses the four correlator FIRs of afsk.py:152-162: magnitude of the
    quadrature pair at each tone, then their difference.
    """
    mi = fir_valid(audio, mark_i, method)
    mq = fir_valid(audio, mark_q, method)
    si = fir_valid(audio, space_i, method)
    sq = fir_valid(audio, space_q, method)
    return jnp.sqrt(mi * mi + mq * mq) - jnp.sqrt(si * si + sq * sq)


def design_length_out(n_in: int, *tap_counts: int) -> int:
    """Output length after a cascade of 'valid' FIR stages."""
    n = n_in
    for t in tap_counts:
        n = n - int(t) + 1
    return n


def np_fir_valid(x: np.ndarray, taps: np.ndarray) -> np.ndarray:
    """Host-side mirror for tests and golden generation."""
    return np.convolve(x, taps, mode="valid")
