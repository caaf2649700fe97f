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

from pymodem_tpu.config import (
    AFSKModemSpec,
    AFSKPLLModemSpec,
    AX25CodecSpec,
    BPSKModemSpec,
    FourLevelSlicerSpec,
    FSKModemSpec,
    MPSKModemSpec,
    QPSKModemSpec,
    load_plan,
)
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
    """Audio carrying N_FRAMES frames, line-coded per the chain's own spec."""
    poly = chain.stream.polynomial if chain.stream else 0x1
    invert = bool(chain.stream.invert) if chain.stream else False
    sent = fx.payloads(rng, count=N_FRAMES, size=30)
    modem = chain.modem
    if isinstance(chain.codec, AX25CodecSpec):
        line = fx.ax25_line_bits(sent, polynomial=poly, invert=invert,
                                 gap_bits=600)
    else:
        line = fx.il2p_line_bits(sent, polynomial=poly, invert=invert,
                                 gap_bits=600)

    if isinstance(modem, AFSKModemSpec):
        return sent, mod.afsk_modulate(line, rate, modem.symbol_rate,
                                       modem.mark_freq, modem.space_freq)
    if isinstance(modem, AFSKPLLModemSpec):
        return sent, mod.afsk_modulate(line, rate, modem.symbol_rate,
                                       modem.carrier_freq - 5.0,
                                       modem.carrier_freq + 5.0)
    if isinstance(modem, BPSKModemSpec):
        return sent, mod.bpsk_modulate(line, rate, modem.symbol_rate,
                                       modem.carrier_freq)
    if isinstance(modem, (QPSKModemSpec, MPSKModemSpec)):
        constellation = getattr(modem, "constellation", "qpsk")
        if constellation == "bpsk":
            return sent, mod.bpsk_modulate(line, rate, modem.symbol_rate,
                                           modem.carrier_freq)
        return sent, mod.qpsk_modulate(line, rate, modem.symbol_rate,
                                       modem.carrier_freq)
    if isinstance(modem, FSKModemSpec):
        if isinstance(chain.slicer, FourLevelSlicerSpec):
            dibits = [(a << 1) | b for a, b in zip(line[::2], line[1::2])]
            return sent, mod.four_level_modulate(
                dibits, rate, chain.slicer.symbol_rate
            )
        return sent, mod.fsk_modulate(line, rate, modem.symbol_rate)
    raise ValueError(type(modem))


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
