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
