"""Every runnable bundled config decodes synthesized on-air audio.

The reference ships fixtures for one config; for the rest this synthesizes
audio matched to each config's FIRST chain (frequencies, rates, line coding
read from the parsed spec itself) and requires the full plan -- all chains,
correlation, reporting -- to recover the transmitted frames through the
banked runtime.  Covers every modem family x codec x scrambler combination
the bundled configs exercise.
"""

import glob
import os

import numpy as np
import pytest

from pymodem_tpu.config import load_plan
from pymodem_tpu.runtime.bank import run_plan_banked
from pymodem_tpu.synth import fixtures as fx
from pymodem_tpu.synth import modulate as mod

CONFIG_DIR = "/root/reference/configs"

# sample rate per config (the reference reads it from the WAV; these match
# the rates its presets were designed around)
RATES = {
    "afsk_1200.json": 44100,
    "afsk_1200_il2p.json": 44100,
    "afsk_1200_ax25_opt.json": 44100,
    # the flagship 8-chain space-gain sweep bank: exercises multi-chain
    # bank grouping end-to-end (all 8 chains share one vmapped program)
    "afsk_1200_ax25_super_opt.json": 44100,
    "afsk_300_ax25.json": 8000,
    "afsk_300_pll.json": 8000,
    "bpsk_300.json": 8000,
    "bpsk_1200.json": 44100,
    "qpsk_600.json": 44100,
    "qpsk_2400.json": 44100,
    "qpsk_3600.json": 44100,
    "fsk_9600.json": 96000,
    "fsk_4800.json": 48000,
    "4fsk_9600.json": 48000,
    "4fsk_19200.json": 96000,
}

N_FRAMES = 3


def _synthesize_for_chain(chain, rate, rng):
    return fx.synthesize_for_chain(chain, rate, rng, n_frames=N_FRAMES,
                                   size=30, gap_bits=600)


@pytest.mark.parametrize("name", sorted(RATES))
def test_config_decodes_synthesized_audio(name, rng):
    path = os.path.join(CONFIG_DIR, name)
    if not os.path.exists(path):
        pytest.skip("reference configs not available")
    rate = RATES[name]
    plan = load_plan(path, rate)
    chain = plan.chains[0]
    sent, audio = _synthesize_for_chain(chain, rate, rng)
    result = run_plan_banked(plan, audio, rate, block_seconds=4.0,
                             overlap_seconds=3.0)
    good = [
        p for p in result.aggregate.unique if p.valid_crc and p.valid_header
    ]
    assert len(good) >= N_FRAMES, (name, len(good))
    payloads = {bytes(p.data[16:-2]) for p in good}
    for payload in sent:
        assert payload in payloads, (name, payload)
