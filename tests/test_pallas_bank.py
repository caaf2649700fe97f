"""End-to-end bank runtime with the Pallas engines forced (interpreter
mode on CPU): run_banked(engine=pallas) packets == run_banked(engine=scan).

Exercises the bank-level Pallas paths in runtime/bank.py
_bank_frames_compute -- the fused AGC+PLL loop kernel and the lane
binary-slicer kernel -- against the vmapped-scan engines on the same
synthesized audio.
"""

import numpy as np
import pytest

from pymodem_tpu.config import (
    AFSKModemSpec,
    AFSKPLLModemSpec,
    BinarySlicerSpec,
    ChainSpec,
    IL2PCodecSpec,
    LFSRStreamSpec,
    QuadratureSlicerSpec,
    _mpsk_preset,
    _qpsk_preset,
)
from pymodem_tpu.runtime.bank import run_banked
from pymodem_tpu.synth import fixtures as fx
from pymodem_tpu.synth import modulate as mod


def _keyed(packets_by_chain):
    return {
        name: sorted((bytes(p.data), p.streamaddress) for p in pkts)
        for name, pkts in packets_by_chain.items()
    }


@pytest.mark.parametrize("family", ["afsk_pll", "afsk"])
def test_pallas_bank_matches_scan(family, rng, monkeypatch):
    sent = fx.payloads(rng, count=3, size=30)
    line = fx.il2p_line_bits(sent, polynomial=0x3, invert=False)
    audio = mod.afsk_modulate(line, 8000.0, 300.0, 1600.0, 1800.0)
    audio = np.concatenate([np.zeros(1000, np.float64), audio,
                            np.zeros(1000, np.float64)])
    if family == "afsk_pll":
        modem = AFSKPLLModemSpec(sample_rate=8000.0, carrier_freq=1700.0)
    else:
        modem = AFSKModemSpec(sample_rate=8000.0, symbol_rate=300.0,
                              mark_freq=1600.0, space_freq=1800.0,
                              output_lpf_cutoff=500.0)
    chains = [
        ChainSpec(
            name=f"c{i}",
            modem=modem,
            slicer=BinarySlicerSpec(sample_rate=8000.0, symbol_rate=300.0,
                                    lock_rate=0.75),
            stream=LFSRStreamSpec(polynomial=0x3, invert=False),
            codec=IL2PCodecSpec(ident=f"c{i}"),
        )
        for i in range(2)
    ]

    monkeypatch.setenv("PYMODEM_TPU_LOOP_ENGINE", "scan")
    want = _keyed(run_banked(chains, audio, block_seconds=4.0,
                             overlap_seconds=1.5))
    assert sum(len(v) for v in want.values()) >= 2 * len(sent) - 2

    monkeypatch.setenv("PYMODEM_TPU_LOOP_ENGINE", "pallas")
    got = _keyed(run_banked(chains, audio, block_seconds=4.0,
                            overlap_seconds=1.5))
    assert got == want


@pytest.mark.parametrize("family", ["qpsk", "mpsk"])
def test_pallas_iq_bank_matches_scan(family, rng, monkeypatch):
    from pymodem_tpu.synth import modulate as mod

    sent = fx.payloads(rng, count=2, size=24)
    line = fx.il2p_line_bits(sent, polynomial=0x1, invert=False)
    if family == "qpsk":
        modem = _qpsk_preset("2400", 44100.0)
    else:
        modem = _mpsk_preset("qpsk_2400", 44100.0)
    audio = mod.qpsk_modulate(line, 44100.0, 1200.0, modem.carrier_freq)
    chains = [
        ChainSpec(
            name=f"c{i}",
            modem=modem,
            slicer=QuadratureSlicerSpec(
                sample_rate=44100.0, symbol_rate=1200.0, lock_rate=0.9,
                bits_per_symbol=2, state_mask=0xF,
            ),
            stream=LFSRStreamSpec(polynomial=0x1, invert=False),
            codec=IL2PCodecSpec(ident=f"c{i}"),
        )
        for i in range(2)
    ]

    monkeypatch.setenv("PYMODEM_TPU_LOOP_ENGINE", "scan")
    want = _keyed(run_banked(chains, audio, block_seconds=2.0,
                             overlap_seconds=0.8))
    assert sum(len(v) for v in want.values()) >= 2 * len(sent) - 1

    monkeypatch.setenv("PYMODEM_TPU_LOOP_ENGINE", "pallas")
    got = _keyed(run_banked(chains, audio, block_seconds=2.0,
                            overlap_seconds=0.8))
    assert got == want


def test_pallas_4fsk_bank_matches_scan(rng, monkeypatch):
    """4FSK (fsk modem + 4-level slicer lane kernel) pallas == scan."""
    import os

    from pymodem_tpu.config import load_plan

    config = "/root/reference/configs/4fsk_9600.json"
    if not os.path.exists(config):
        pytest.skip("reference configs not available")
    plan = load_plan(config, 48000)
    chains = [c for c in plan.chains if "inverted" not in c.name]
    sent, audio = fx.synthesize_for_chain(chains[0], 48000.0, rng)

    monkeypatch.setenv("PYMODEM_TPU_LOOP_ENGINE", "scan")
    want = _keyed(run_banked(chains, audio, block_seconds=4.0,
                             overlap_seconds=3.0))
    assert sum(len(v) for v in want.values()) >= len(sent) - 1

    monkeypatch.setenv("PYMODEM_TPU_LOOP_ENGINE", "pallas")
    got = _keyed(run_banked(chains, audio, block_seconds=4.0,
                            overlap_seconds=3.0))
    assert got == want


@pytest.mark.parametrize("window", [1, 8])
def test_quadrature_lanes_kernel_parity(rng, window):
    """Direct kernel-vs-scan parity for the quadrature lane kernel
    (interpret mode), both emission encodings."""
    import jax.numpy as jnp

    from pymodem_tpu.config import _QPSK_DEMAP
    from pymodem_tpu.ops.pallas_slicers import (
        decode_emissions,
        quadrature_slice_lanes_pallas,
    )
    from pymodem_tpu.ops.slicers import (
        SlicerOut,
        compact_bytes,
        compact_windowed,
        quadrature_slice,
    )

    L, T, cap = 3, 2048, 64
    sps, lock = 16.0, 0.9
    i_l = rng.standard_normal((L, T)).astype(np.float32)
    q_l = rng.standard_normal((L, T)).astype(np.float32)
    lane_params = np.tile(
        np.asarray([[sps], [lock]], np.float32), (1, L)
    )
    enc = quadrature_slice_lanes_pallas(
        jnp.asarray(i_l), jnp.asarray(q_l), jnp.asarray(lane_params),
        _QPSK_DEMAP, 0xF, 2, window=window,
    )
    demap = jnp.asarray(_QPSK_DEMAP, jnp.int32)
    for lane in range(L):
        ref = quadrature_slice(
            jnp.asarray(i_l[lane]), jnp.asarray(q_l[lane]),
            jnp.float32(sps), jnp.float32(lock), demap, 0xF, 2,
        )
        want = tuple(np.asarray(v) for v in compact_bytes(ref, cap, 1))
        if window == 1:
            out = decode_emissions(enc[lane])
            got = tuple(np.asarray(v) for v in compact_bytes(out, cap, 1))
        else:
            got = tuple(
                np.asarray(v)
                for v in compact_windowed(enc[lane], window, cap)
            )
        assert got[2] == want[2] and got[2] > 0
        n = int(want[2])
        np.testing.assert_array_equal(got[0][:n], want[0][:n])
        np.testing.assert_array_equal(got[1][:n], want[1][:n])


@pytest.mark.parametrize("window", [1, 8])
def test_four_level_lanes_kernel_parity(rng, window):
    """Direct kernel-vs-scan parity for the 4-level lane kernel."""
    import jax.numpy as jnp

    from pymodem_tpu.config import FourLevelSlicerSpec
    from pymodem_tpu.ops.pallas_slicers import (
        decode_emissions,
        four_level_slice_lanes_pallas,
    )
    from pymodem_tpu.ops.slicers import (
        compact_bytes,
        compact_windowed,
        four_level_slice,
    )
    from pymodem_tpu.synth import modulate as mod

    demap = FourLevelSlicerSpec().demap
    L, cap = 2, 64
    sps, lock = 10.0, 0.99
    dibits = list(rng.integers(0, 4, size=200))
    audio = mod.four_level_modulate(dibits, 48000.0, 4800.0)
    x = np.stack([audio, -audio]).astype(np.float32)[:, : 4096]
    T = x.shape[1]
    lane_params = np.tile(
        np.asarray([[sps], [lock]], np.float32), (1, L)
    )
    enc = four_level_slice_lanes_pallas(
        jnp.asarray(x), jnp.asarray(lane_params), demap, window=window
    )
    dm = jnp.asarray(demap, jnp.int32)
    for lane in range(L):
        ref = four_level_slice(
            jnp.asarray(x[lane]), jnp.float32(sps), jnp.float32(lock), dm,
            jnp.float32(0.0),
        )
        want = tuple(np.asarray(v) for v in compact_bytes(ref, cap, 1))
        if window == 1:
            out = decode_emissions(enc[lane])
            got = tuple(np.asarray(v) for v in compact_bytes(out, cap, 1))
        else:
            got = tuple(
                np.asarray(v)
                for v in compact_windowed(enc[lane], window, cap)
            )
        assert got[2] == want[2] and got[2] > 0
        n = int(want[2])
        np.testing.assert_array_equal(got[0][:n], want[0][:n])
        np.testing.assert_array_equal(got[1][:n], want[1][:n])
