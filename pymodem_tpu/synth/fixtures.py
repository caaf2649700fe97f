"""Synthetic golden fixtures: modulated frames for every chain family.

The reference has no transmit path and ships one AFSK-300 WAV, so every
other modem family is validated against audio synthesized here
(SURVEY.md section 4).  Each builder returns (audio_float, sent_payloads)
for a given chain spec; the round-trip contract decode(modulate(frames))
== frames is asserted in tests/test_synth.py.
"""

from __future__ import annotations

import numpy as np

from . import encode as enc
from . import modulate as mod


def _idle_bits(n: int) -> list[int]:
    return [1 if i % 2 == 0 else 0 for i in range(n)]


def il2p_line_bits(payloads, polynomial: int = 0x3, invert: bool = False,
                   gap_bits: int = 400, dest: str = "KI5ABC",
                   source: str = "N0CALL") -> list[int]:
    """Concatenated IL2P frames with alternating idle fill, scrambled into
    line bits.

    The whole line (idle fill included) scrambles as ONE free-running
    stream, like a real transmitter and like ax25_line_bits: the decoder's
    multiplicative descrambler is free-running too (lfsr.py:22-51), so
    per-frame scrambling with zeroed history would corrupt each frame's
    first ``poly bit_length`` descrambled bits -- harmless for poly 0x3
    (1 bit of history, landing on a 0 idle bit) but fatal for G3RUH
    0x63003, whose 19-bit history straddles the sync word."""
    bits: list[int] = []
    for payload in payloads:
        frame = enc.il2p_frame(dest, source, payload)
        bits += _idle_bits(gap_bits)
        bits += enc.bytes_to_bits_msb(frame)
    bits += _idle_bits(gap_bits)
    return enc.scramble_bits(bits, polynomial, invert)


def ax25_line_bits(frames_payloads, polynomial: int = 0x3, invert: bool = True,
                   gap_bits: int = 400, dest: str = "KI5ABC",
                   source: str = "N0CALL") -> list[int]:
    """Concatenated AX.25/HDLC frames, NRZI(+scramble)-encoded line bits."""
    bits: list[int] = []
    for payload in frames_payloads:
        frame = enc.ax25_ui_frame(dest, source, payload)
        bits += _idle_bits(gap_bits)
        bits += enc.hdlc_encode(frame, flag_count=8)
    bits += _idle_bits(gap_bits)
    return enc.scramble_bits(bits, polynomial, invert)


def payloads(rng: np.random.Generator, count: int = 3,
             size: int = 40) -> list[bytes]:
    """ASCII payloads (printable-header safe for IL2P type-0 checks)."""
    alphabet = np.frombuffer(
        b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 ",
        dtype=np.uint8,
    )
    return [
        bytes(rng.choice(alphabet, size=size)) for _ in range(count)
    ]


def synthesize_for_chain(chain, rate: float, rng: np.random.Generator,
                         n_frames: int = 3, size: int = 30,
                         gap_bits: int = 600):
    """Audio carrying ``n_frames`` frames, line-coded per the chain's OWN
    spec (codec family, scrambler poly/invert, modem tones/rates read from
    the parsed config) -- golden audio matched to any bundled config.
    Returns (sent_payloads, audio_float)."""
    from ..config import (
        AFSKModemSpec,
        AFSKPLLModemSpec,
        AX25CodecSpec,
        BPSKModemSpec,
        FourLevelSlicerSpec,
        FSKModemSpec,
        MPSKModemSpec,
        QPSKModemSpec,
    )

    poly = chain.stream.polynomial if chain.stream else 0x1
    invert = bool(chain.stream.invert) if chain.stream else False
    sent = payloads(rng, count=n_frames, size=size)
    modem = chain.modem
    if isinstance(chain.codec, AX25CodecSpec):
        line = ax25_line_bits(sent, polynomial=poly, invert=invert,
                              gap_bits=gap_bits)
    else:
        line = il2p_line_bits(sent, polynomial=poly, invert=invert,
                              gap_bits=gap_bits)

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
