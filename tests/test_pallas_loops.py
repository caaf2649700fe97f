"""Pallas loop kernel == vmapped lax.scan loops (interpreter mode on CPU).

On TPU the kernel's ops are the same primitives in the same order as the
scan path and Mosaic's f32 sin is bitwise identical to XLA's, so outputs
match bit for bit; on the CPU interpreter they must match to f32 ulp.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pymodem_tpu import modems
from pymodem_tpu.config import AFSKPLLModemSpec, _bpsk_preset
from pymodem_tpu.dsp.loops import LoopParams, afsk_pll, bpsk_costas
from pymodem_tpu.dsp.pallas_loops import (
    lane_params_from_loop,
    loop_lanes_pallas,
)


def _f32_loop_params(spec):
    lp = modems._loop_params_host(spec)
    return LoopParams(**{
        k: (np.asarray(v, np.float32)
            if np.asarray(v).dtype.kind == "f" else np.asarray(v))
        for k, v in lp._asdict().items()
    })


def _stack(params_list):
    return LoopParams(*[
        np.stack([np.asarray(getattr(p, f)) for p in params_list])
        for f in LoopParams._fields
    ])


@pytest.mark.parametrize("kind", ["afsk_pll", "bpsk"])
def test_pallas_loop_matches_scan(kind, rng):
    if kind == "afsk_pll":
        specs = [AFSKPLLModemSpec(sample_rate=8000.0,
                                  carrier_freq=1700.0 + 10 * i)
                 for i in range(2)]
        scan_fn = afsk_pll
    else:
        specs = [_bpsk_preset("300", 8000.0)]
        scan_fn = bpsk_costas

    params = [_f32_loop_params(s) for s in specs]
    B = 3
    T = 700
    C = len(specs)
    x = rng.standard_normal((C, B, T)).astype(np.float32)

    # scan reference: vmap over chains and blocks
    want = np.stack([
        np.stack([
            np.asarray(scan_fn(jnp.asarray(x[c, b]), params[c], unroll=4))
            for b in range(B)
        ])
        for c in range(C)
    ])

    stacked = _stack(params)
    lane_params = lane_params_from_loop(stacked, C, B)
    got = np.asarray(
        loop_lanes_pallas(jnp.asarray(x.reshape(C * B, T)), lane_params,
                          kind, wavetable_size=256, tc=256)
    ).reshape(C, B, T)

    # CPU interpreter and XLA CPU take different libm paths for sin/cos
    # (ulp-level), and the feedback loop carries that forward -- the bound
    # stays tiny because the loop is contractive.  On TPU the kernel is
    # bitwise identical to the scan (Mosaic sin == XLA sin, verified on
    # hardware; see tools/pallas_parity.py).
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
