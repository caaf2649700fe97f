"""Cross-runtime parity matrix: banked == sequential executor per family.

test_config_decode proves every runnable config decodes its synthesized
audio through the BANKED runtime; this module closes the loop by asserting
the banked packets equal the sequential executor's (the reference-parity
implementation, runtime/executor.py) for one representative config of
every modem family x slicer x codec combination, on the same synth audio,
in float64.  Addresses may differ by the documented block byte-phase
quantum (<= 7 symbol periods, CLAUDE.md architecture invariants; the
assertion allows 8 for one period of margin); payload byte sequences
must be identical.
"""

import os

import numpy as np
import pytest

from pymodem_tpu.config import load_plan
from pymodem_tpu.runtime.bank import run_banked
from pymodem_tpu.runtime.executor import run_chain
from pymodem_tpu.synth import fixtures as fx

CONFIG_DIR = "/root/reference/configs"

# one representative per family: (config, sample rate).  afsk_pll is
# covered by the stronger fixture-golden parity tests instead
# (test_bank_runtime.test_banked_decode_parity, test_e2e_parity): its
# config's first chain does not decode this synthetic audio in EITHER
# runtime, so a synth row would assert nothing.
MATRIX = {
    "afsk_1200_il2p.json": 44100,  # afsk + binary + il2p
    "afsk_300_ax25.json": 8000,    # afsk + binary + ax25/hdlc
    "bpsk_1200.json": 44100,       # bpsk costas + binary
    "qpsk_2400.json": 44100,       # mpsk (analytic) + quadrature
    "fsk_9600.json": 96000,        # fsk + binary + scrambler
    "4fsk_9600.json": 48000,       # fsk + 4-level slicer
}


@pytest.mark.parametrize("name", sorted(MATRIX))
def test_banked_matches_executor(name, rng):
    path = os.path.join(CONFIG_DIR, name)
    if not os.path.exists(path):
        pytest.skip("reference configs not available")
    rate = MATRIX[name]
    plan = load_plan(path, rate)
    chain = plan.chains[0]
    sent, audio = fx.synthesize_for_chain(chain, rate, rng, n_frames=3,
                                          size=30, gap_bits=600)
    audio = np.asarray(audio)

    seq = run_chain(chain, audio)
    banked = run_banked([chain], audio, block_seconds=4.0,
                        overlap_seconds=3.0)[chain.name]

    a = [(p.streamaddress, bytes(p.data)) for p in seq]
    b = [(p.streamaddress, bytes(p.data)) for p in banked]
    assert [d for _, d in a] == [d for _, d in b], name
    sl = chain.slicer
    quantum = 8 * sl.sample_rate / sl.symbol_rate
    for (aa, _), (ab, _) in zip(a, b):
        assert abs(aa - ab) <= quantum, name
    assert len(a) >= 3  # every transmitted frame recovered by both
