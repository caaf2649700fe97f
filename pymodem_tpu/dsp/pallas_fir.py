"""Pallas TPU kernel: tiled 'valid' FIR convolution.

A custom-kernel alternative to the XLA overlap-save FFT path in dsp/fir.py
for the bulk filtering stages (input band-pass, output low-pass, RRC).  Each
grid step owns one (row, output-tile) pair: the kernel reads the tile's
input window from two adjacent VMEM blocks of the signal (the halo is the
next tile, so no overlapping BlockSpecs are needed), and accumulates the
convolution as ``t`` fused shift-multiply-adds on the VPU -- for the tap
counts in this workload (tens to ~200) that is pure VPU work with zero FFT
memory traffic.

Equivalence to numpy.convolve(mode='valid') is asserted in
tests/test_pallas_fir.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TILE = 512


ROWS = 8  # sublane-aligned row group per program


def _fir_kernel(taps_ref, x0_ref, x1_ref, o_ref, *, t: int):
    window = jnp.concatenate([x0_ref[...], x1_ref[...]], axis=1)  # (ROWS, 2*TILE)
    # static slices: the tap loop is unrolled, so every window offset is a
    # compile-time constant (dynamic_slice has no Mosaic lowering)
    acc = taps_ref[0, t - 1] * window[:, 0:TILE]
    for j in range(t - 1):
        s = t - 1 - j
        acc = acc + taps_ref[0, j] * window[:, s : s + TILE]
    o_ref[...] = acc


@partial(jax.jit, static_argnames=("interpret",))
def pallas_fir_valid(x: jax.Array, taps: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """'valid' convolution over the last axis: x (..., n), taps (t,).

    Requires t <= TILE.  Output length n - t + 1.
    """
    t = taps.shape[-1]
    assert t <= TILE, (t, TILE)
    n = x.shape[-1]
    nout = n - t + 1
    batch = x.shape[:-1]
    rows = int(np.prod(batch)) if batch else 1
    rows_pad = -(-rows // ROWS) * ROWS
    n_tiles = -(-nout // TILE)
    # pad so every x block (including the halo tile) is in range
    padded_len = (n_tiles + 1) * TILE
    x2 = jnp.pad(
        x.reshape(rows, n), ((0, rows_pad - rows), (0, padded_len - n))
    )
    taps2 = taps.reshape(1, t)

    out = pl.pallas_call(
        partial(_fir_kernel, t=t),
        grid=(rows_pad // ROWS, n_tiles),
        in_specs=[
            pl.BlockSpec((1, t), lambda r, i: (0, 0)),
            pl.BlockSpec((ROWS, TILE), lambda r, i: (r, i)),
            pl.BlockSpec((ROWS, TILE), lambda r, i: (r, i + 1)),
        ],
        out_specs=pl.BlockSpec((ROWS, TILE), lambda r, i: (r, i)),
        out_shape=jax.ShapeDtypeStruct((rows_pad, n_tiles * TILE), x.dtype),
        interpret=interpret,
    )(taps2, x2, x2)
    return out[:rows, :nout].reshape(*batch, nout)
