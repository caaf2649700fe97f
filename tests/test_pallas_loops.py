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


def test_pallas_loop_fused_agc_matches_scan(rng):
    """15-row lane params run the AGC envelope follower inside the kernel;
    must equal agc_apply (scan) -> afsk_pll (scan)."""
    from pymodem_tpu.dsp.agc import agc_apply
    from pymodem_tpu.dsp.pallas_loops import agc_lane_params
    from pymodem_tpu.modems import _agc_params
    from pymodem_tpu.config import AFSKPLLModemSpec

    specs = [AFSKPLLModemSpec(sample_rate=8000.0,
                              carrier_freq=1700.0 + 10 * i)
             for i in range(2)]
    params = [_f32_loop_params(s) for s in specs]
    agcs = [_agc_params(s.agc, s.sample_rate) for s in specs]
    B, T, C = 3, 700, len(specs)
    x = (rng.standard_normal((C, B, T)) * 2.0).astype(np.float32)

    want = []
    normals = []
    for c in range(C):
        nm = np.float32(x[c].max())
        normals.append(nm)
        a = agcs[c]
        rows = []
        for b in range(B):
            y = agc_apply(
                jnp.asarray(x[c, b]),
                scaled_attack=np.float32(a.scaled_attack),
                scaled_decay=np.float32(a.scaled_decay),
                sustain_time=np.float32(a.sustain_time),
                sustain_increment=np.float32(a.sustain_increment),
                target_amplitude=np.float32(a.target),
                unroll=4, normal=jnp.asarray(nm),
            )
            rows.append(np.asarray(afsk_pll(y, params[c], unroll=4)))
        want.append(np.stack(rows))
    want = np.stack(want)

    stacked = _stack(params)

    class _A:
        scaled_attack = np.array([np.float32(a.scaled_attack) for a in agcs])
        scaled_decay = np.array([np.float32(a.scaled_decay) for a in agcs])
        sustain_time = np.array([np.float32(a.sustain_time) for a in agcs])
        sustain_increment = np.array(
            [np.float32(a.sustain_increment) for a in agcs])
        target = np.array([np.float32(a.target) for a in agcs])

    lane_params = jnp.concatenate([
        lane_params_from_loop(_stack(params), C, B),
        agc_lane_params(_A, jnp.asarray(np.array(normals)), C, B),
    ])
    got = np.asarray(
        loop_lanes_pallas(jnp.asarray(x.reshape(C * B, T)), lane_params,
                          "afsk_pll", wavetable_size=256, tc=256)
    ).reshape(C, B, T)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pallas_qpsk_matches_scan(rng):
    from pymodem_tpu.config import _qpsk_preset
    from pymodem_tpu.dsp.loops import QPSKLoopParams, qpsk_costas
    from pymodem_tpu.dsp.pallas_loops import iq_loop_lanes_pallas
    from pymodem_tpu.dsp import window_design as wd

    spec = _qpsk_preset("600", 8000.0)
    lp = _f32_loop_params(spec)
    bb0, ba1 = wd.iir1_lpf_coefs(spec.sample_rate, spec.branch_lpf_cutoff, 1.0)
    qparams = QPSKLoopParams(base=lp, branch_b0=np.float32(bb0),
                             branch_a1=np.float32(ba1))
    B, T = 3, 700
    x = rng.standard_normal((B, T)).astype(np.float32)

    want_i, want_q = [], []
    for b in range(B):
        i_d, q_d = qpsk_costas(jnp.asarray(x[b]), qparams, unroll=4)
        want_i.append(np.asarray(i_d))
        want_q.append(np.asarray(q_d))

    lane_params = jnp.concatenate([
        lane_params_from_loop(_stack([lp]), 1, B),
        jnp.full((1, B), bb0, jnp.float32),
        jnp.full((1, B), ba1, jnp.float32),
    ])
    got_i, got_q = iq_loop_lanes_pallas(jnp.asarray(x), lane_params, "qpsk",
                                        wavetable_size=256, tc=256)
    np.testing.assert_allclose(np.asarray(got_i), np.stack(want_i),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_q), np.stack(want_q),
                               rtol=1e-4, atol=1e-3)


def test_pallas_mpsk_matches_scan(rng):
    from pymodem_tpu.config import _mpsk_preset
    from pymodem_tpu.dsp.loops import MPSKLoopParams, mpsk_loop
    from pymodem_tpu.dsp.pallas_loops import iq_loop_lanes_pallas
    from pymodem_tpu import modems

    spec = _mpsk_preset("qpsk_600", 8000.0)
    lp = _f32_loop_params(spec)
    mp = modems.build_params(spec)
    mparams = MPSKLoopParams(
        base=lp, pd_table=jnp.asarray(mp.pd_table),
        pd_granularity=np.int32(spec.pd_granularity),
        pd_gain=np.float32(spec.pd_gain),
    )
    B, T = 3, 700
    re = rng.standard_normal((B, T)).astype(np.float32)
    im = rng.standard_normal((B, T)).astype(np.float32)

    want_i, want_q = [], []
    for b in range(B):
        i_d, q_d = mpsk_loop(jnp.asarray(re[b]), jnp.asarray(im[b]),
                             mparams, unroll=4)
        want_i.append(np.asarray(i_d))
        want_q.append(np.asarray(q_d))

    lane_params = jnp.concatenate([
        lane_params_from_loop(_stack([lp]), 1, B),
        jnp.full((1, B), spec.pd_gain, jnp.float32),
        jnp.full((1, B), float(spec.pd_granularity), jnp.float32),
    ])
    got_i, got_q = iq_loop_lanes_pallas(
        (jnp.asarray(re), jnp.asarray(im)), lane_params, "mpsk",
        wavetable_size=256, tc=256)
    np.testing.assert_allclose(np.asarray(got_i), np.stack(want_i),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_q), np.stack(want_q),
                               rtol=1e-4, atol=1e-3)


def test_pallas_agc_kind_matches_scan(rng):
    from pymodem_tpu.dsp.agc import agc_apply
    from pymodem_tpu.config import AFSKPLLModemSpec
    from pymodem_tpu.modems import _agc_params

    spec = AFSKPLLModemSpec(sample_rate=8000.0)
    a = _agc_params(spec.agc, spec.sample_rate)
    B, T = 4, 600
    x = (rng.standard_normal((B, T)) * 1.7).astype(np.float32)
    nm = np.float32(x.max())
    want = np.stack([
        np.asarray(agc_apply(
            jnp.asarray(x[b]),
            scaled_attack=np.float32(a.scaled_attack),
            scaled_decay=np.float32(a.scaled_decay),
            sustain_time=np.float32(a.sustain_time),
            sustain_increment=np.float32(a.sustain_increment),
            target_amplitude=np.float32(a.target), unroll=4,
            normal=jnp.asarray(nm),
        )) for b in range(B)
    ])
    rows = jnp.stack([
        jnp.full((B,), np.float32(a.scaled_attack) * nm),
        jnp.full((B,), np.float32(a.scaled_decay) * nm),
        jnp.full((B,), np.float32(a.sustain_time)),
        jnp.full((B,), np.float32(a.sustain_increment)),
        jnp.full((B,), np.float32(a.target)),
    ])
    got = np.asarray(
        loop_lanes_pallas(jnp.asarray(x), rows, "agc", tc=256)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_binary_slicer_matches_scan(rng):
    """Pallas lane slicer emissions == binary_slice scan (exact: the step
    is compare/select/int arithmetic only)."""
    from pymodem_tpu.ops.pallas_slicers import (
        binary_slice_lanes_pallas,
        decode_emissions,
    )
    from pymodem_tpu.ops.slicers import binary_slice

    L, T = 5, 900
    sps = np.array([8.0, 8.0, 13.19, 40.0, 6.0], np.float32)
    lock = np.array([0.75, 0.9, 0.75, 0.65, 0.97], np.float32)
    x = rng.standard_normal((L, T)).astype(np.float32)

    enc = binary_slice_lanes_pallas(
        jnp.asarray(x), jnp.asarray(np.stack([sps, lock])), tc=128
    )
    got = decode_emissions(enc)
    for lane in range(L):
        want = binary_slice(jnp.asarray(x[lane]), jnp.float32(sps[lane]),
                            jnp.float32(lock[lane]), unroll=4)
        np.testing.assert_array_equal(np.asarray(got.valid[lane]),
                                      np.asarray(want.valid))
        # bytes only meaningful on valid slots
        v = np.asarray(want.valid)
        np.testing.assert_array_equal(np.asarray(got.byte[lane])[v],
                                      np.asarray(want.byte)[v])


def test_windowed_slicer_kernel_matches_dense(rng):
    """window>1 kernel emission == dense kernel + compact_bytes windowing
    (ops/pallas_slicers.py windowed path; ops/slicers.compact_windowed)."""
    import jax.numpy as jnp

    from pymodem_tpu.ops.pallas_slicers import (
        binary_slice_lanes_pallas,
        decode_emissions,
    )
    from pymodem_tpu.ops.slicers import (
        SlicerOut,
        compact_bytes,
        compact_windowed,
    )

    lanes, T, w, cap = 4, 5000, 64, 64
    x = jnp.asarray(rng.normal(size=(lanes, T)).astype(np.float32))
    lp = jnp.stack([jnp.full((lanes,), 26.667, jnp.float32),
                    jnp.full((lanes,), 0.75, jnp.float32)])
    dense = binary_slice_lanes_pallas(x, lp)
    valid, byte = decode_emissions(dense)
    want = [compact_bytes(SlicerOut(valid[i], byte[i]), cap, w)
            for i in range(lanes)]
    encw = binary_slice_lanes_pallas(x, lp, window=w)
    assert encw.shape == (lanes, -(-T // w))
    got = [compact_windowed(encw[i], w, cap) for i in range(lanes)]
    for (wd, wa, wc), (gd, ga, gc) in zip(want, got):
        assert int(wc) == int(gc) and int(wc) > 0
        assert np.array_equal(np.asarray(wd), np.asarray(gd))
        assert np.array_equal(np.asarray(wa), np.asarray(ga))


def test_mpsk_pd_polynomial_exhaustive():
    """The MPSK Pallas kernel's first-quadrant atan polynomial (Mosaic has
    no atan2 lowering) produces the IDENTICAL rounded phase-detector error
    as f32 atan2 for EVERY integer (a, b) the quadrant fold can emit at the
    preset pd_gain=32 / pd_granularity=64 (psk.py:523-545 quantization) --
    checked exhaustively, so the decision contract is proof, not tolerance."""
    import numpy as np

    gain, g = np.float32(32.0), 64
    a, b = np.meshgrid(np.arange(g, dtype=np.float32),
                       np.arange(g, dtype=np.float32))
    af, bf = a.ravel(), b.ravel()
    keep = ~((af == 0) & (bf == 0))  # (0,0) is magnitude-gated in-kernel
    af, bf = af[keep], bf[keep]
    swap = bf > af
    t = (np.where(swap, af, bf) / np.where(swap, bf, af)).astype(np.float32)
    s = t * t
    atan = t * (np.float32(0.99997726) + s * (np.float32(-0.33262347) + s * (
        np.float32(0.19354346) + s * (np.float32(-0.11643287) + s * (
            np.float32(0.05265332) + s * np.float32(-0.01172120))))))
    rad = np.where(swap, np.float32(np.pi / 2) - atan, atan)
    deg_poly = rad * np.float32(180.0 / np.pi)
    deg_ref = np.degrees(np.arctan2(bf, af)).astype(np.float32)
    err_poly = np.round(gain * (deg_poly - np.float32(45.0)))
    err_ref = np.round(gain * (deg_ref - np.float32(45.0)))
    np.testing.assert_array_equal(err_poly, err_ref)
