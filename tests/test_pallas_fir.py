"""Pallas FIR kernel vs numpy.convolve (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pymodem_tpu.dsp.fir import np_fir_valid
from pymodem_tpu.dsp.pallas_fir import pallas_fir_valid


@pytest.mark.parametrize("n,t", [(2000, 187), (700, 8), (1536, 103)])
def test_pallas_fir_matches_numpy(rng, n, t):
    x = rng.standard_normal((3, n)).astype(np.float32)
    h = rng.standard_normal(t).astype(np.float32)
    got = np.asarray(pallas_fir_valid(jnp.asarray(x), jnp.asarray(h),
                                      interpret=True))
    for r in range(3):
        ref = np_fir_valid(x[r].astype(np.float64), h.astype(np.float64))
        err = np.abs(got[r] - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 1e-5, err
