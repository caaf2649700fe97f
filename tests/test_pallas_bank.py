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
