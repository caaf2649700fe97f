"""Round-trip tests: synthesize -> modulate -> full decode chain -> packets.

Covers the modem families the bundled fixture cannot (BPSK, QPSK, MPSK,
FSK/G3RUH, 4FSK) plus AFSK, per SURVEY.md section 4's fixture strategy.
Each test builds a chain spec, synthesizes frames with the matching line
coding, runs the sequential executor, and checks the decoded payloads.
"""

import numpy as np
import pytest

from pymodem_tpu.config import (
    AFSKModemSpec,
    AX25CodecSpec,
    BPSKModemSpec,
    BinarySlicerSpec,
    ChainSpec,
    FourLevelSlicerSpec,
    FSKModemSpec,
    IL2PCodecSpec,
    LFSRStreamSpec,
    MPSKModemSpec,
    QPSKModemSpec,
    QuadratureSlicerSpec,
    _mpsk_preset,
    _qpsk_preset,
)
from pymodem_tpu.runtime.executor import run_chain
from pymodem_tpu.synth import encode as enc
from pymodem_tpu.synth import fixtures as fx
from pymodem_tpu.synth import modulate as mod


def _decoded_payloads(packets):
    """Extract payload text from validated IL2P/AX.25 packets."""
    out = []
    for p in packets:
        p.validate()
        if p.valid_crc:
            # type-1 UI frame: 14 addr bytes + control + pid, CRC last 2
            out.append(bytes(p.data[16:-2]))
    return out


def test_afsk1200_il2p_roundtrip(rng):
    sent = fx.payloads(rng, count=3, size=40)
    line = fx.il2p_line_bits(sent, polynomial=0x3, invert=False)
    audio = mod.afsk_modulate(line, 8000.0, 1200.0, 1200.0, 2200.0)
    chain = ChainSpec(
        name="afsk1200",
        modem=AFSKModemSpec(sample_rate=8000.0),
        slicer=BinarySlicerSpec(sample_rate=8000.0, symbol_rate=1200.0, lock_rate=0.75),
        stream=LFSRStreamSpec(polynomial=0x3, invert=False),
        codec=IL2PCodecSpec(ident="afsk1200"),
    )
    got = _decoded_payloads(run_chain(chain, audio))
    assert got == sent


def test_afsk1200_ax25_roundtrip(rng):
    sent = fx.payloads(rng, count=3, size=30)
    line = fx.ax25_line_bits(sent, polynomial=0x3, invert=True)
    audio = mod.afsk_modulate(line, 8000.0, 1200.0, 1200.0, 2200.0)
    chain = ChainSpec(
        name="ax25",
        modem=AFSKModemSpec(sample_rate=8000.0),
        slicer=BinarySlicerSpec(sample_rate=8000.0, symbol_rate=1200.0, lock_rate=0.75),
        stream=LFSRStreamSpec(polynomial=0x3, invert=True),
        codec=AX25CodecSpec(ident="ax25"),
    )
    got = _decoded_payloads(run_chain(chain, audio))
    assert got == sent


def test_fsk9600_g3ruh_ax25_roundtrip(rng):
    sent = fx.payloads(rng, count=3, size=30)
    line = fx.ax25_line_bits(sent, polynomial=0x63003, invert=False, gap_bits=600)
    audio = mod.fsk_modulate(line, 96000.0, 9600.0)
    chain = ChainSpec(
        name="fsk9600",
        modem=FSKModemSpec(sample_rate=96000.0),
        slicer=BinarySlicerSpec(sample_rate=96000.0, symbol_rate=9600.0, lock_rate=0.88),
        stream=LFSRStreamSpec(polynomial=0x63003, invert=False),
        codec=AX25CodecSpec(ident="fsk9600"),
    )
    got = _decoded_payloads(run_chain(chain, audio))
    assert got == sent


def test_bpsk300_il2p_roundtrip(rng):
    sent = fx.payloads(rng, count=2, size=30)
    line = fx.il2p_line_bits(sent, polynomial=0x3, invert=False)
    audio = mod.bpsk_modulate(line, 8000.0, 300.0, 1500.0)
    chain = ChainSpec(
        name="bpsk300",
        modem=BPSKModemSpec(sample_rate=8000.0),
        slicer=BinarySlicerSpec(sample_rate=8000.0, symbol_rate=300.0, lock_rate=0.75),
        stream=LFSRStreamSpec(polynomial=0x3, invert=False),
        codec=IL2PCodecSpec(ident="bpsk300"),
    )
    got = _decoded_payloads(run_chain(chain, audio))
    assert got == sent


def test_qpsk2400_il2p_roundtrip(rng):
    sent = fx.payloads(rng, count=2, size=30)
    line = fx.il2p_line_bits(sent, polynomial=0x1, invert=False)
    spec = _qpsk_preset("2400", 44100.0)
    audio = mod.qpsk_modulate(line, 44100.0, 1200.0, spec.carrier_freq)
    chain = ChainSpec(
        name="qpsk2400",
        modem=spec,
        slicer=QuadratureSlicerSpec(
            sample_rate=44100.0, symbol_rate=1200.0, lock_rate=0.9,
            bits_per_symbol=2, state_mask=0xF,
        ),
        stream=LFSRStreamSpec(polynomial=0x1, invert=False),
        codec=IL2PCodecSpec(ident="qpsk2400"),
    )
    got = _decoded_payloads(run_chain(chain, audio))
    assert got == sent


def test_4fsk9600_il2p_roundtrip(rng):
    sent = fx.payloads(rng, count=2, size=30)
    line = fx.il2p_line_bits(sent, polynomial=0x1, invert=False, gap_bits=600)
    dibits = [
        (a << 1) | b for a, b in zip(line[::2], line[1::2])
    ]
    audio = mod.four_level_modulate(dibits, 96000.0, 4800.0)
    chain = ChainSpec(
        name="4fsk",
        modem=FSKModemSpec(sample_rate=96000.0, symbol_rate=4800.0,
                           input_lpf_cutoff=3000.0, input_lpf_span=1.5),
        slicer=FourLevelSlicerSpec(sample_rate=96000.0, symbol_rate=4800.0),
        stream=LFSRStreamSpec(polynomial=0x1, invert=False),
        codec=IL2PCodecSpec(ident="4fsk"),
    )
    got = _decoded_payloads(run_chain(chain, audio))
    assert got == sent


def test_mpsk_qpsk2400_il2p_roundtrip(rng):
    sent = fx.payloads(rng, count=2, size=30)
    line = fx.il2p_line_bits(sent, polynomial=0x1, invert=False)
    spec = _mpsk_preset("qpsk_2400", 44100.0)
    audio = mod.qpsk_modulate(line, 44100.0, 1200.0, spec.carrier_freq)
    chain = ChainSpec(
        name="mpsk2400",
        modem=spec,
        slicer=QuadratureSlicerSpec(
            sample_rate=44100.0, symbol_rate=1200.0, lock_rate=0.9,
            bits_per_symbol=2, state_mask=0xF,
        ),
        stream=LFSRStreamSpec(polynomial=0x1, invert=False),
        codec=IL2PCodecSpec(ident="mpsk2400"),
    )
    got = _decoded_payloads(run_chain(chain, audio))
    assert got == sent


def test_mpsk_bpsk1200_il2p_roundtrip(rng):
    sent = fx.payloads(rng, count=2, size=30)
    line = fx.il2p_line_bits(sent, polynomial=0x3, invert=False)
    spec = _mpsk_preset("bpsk_1200", 44100.0)
    audio = mod.bpsk_modulate(line, 44100.0, 1200.0, spec.carrier_freq)
    chain = ChainSpec(
        name="mpskb1200",
        modem=spec,
        slicer=QuadratureSlicerSpec(
            sample_rate=44100.0, symbol_rate=1200.0, lock_rate=0.9,
            bits_per_symbol=1, state_mask=0x3, demap=(0, 0, 1, 1),
        ),
        stream=LFSRStreamSpec(polynomial=0x3, invert=False),
        codec=IL2PCodecSpec(ident="mpskb1200"),
    )
    got = _decoded_payloads(run_chain(chain, audio))
    assert got == sent


def test_afsk1200_il2p_noisy(rng):
    """Decode survives moderate AWGN (the fixture's own regime)."""
    sent = fx.payloads(rng, count=3, size=40)
    line = fx.il2p_line_bits(sent, polynomial=0x3, invert=False)
    clean = mod.afsk_modulate(line, 8000.0, 1200.0, 1200.0, 2200.0)
    audio = mod.awgn(clean, snr_db=10.0, rng=rng)
    chain = ChainSpec(
        name="afsk-noisy",
        modem=AFSKModemSpec(sample_rate=8000.0),
        slicer=BinarySlicerSpec(sample_rate=8000.0, symbol_rate=1200.0, lock_rate=0.75),
        stream=LFSRStreamSpec(polynomial=0x3, invert=False),
        codec=IL2PCodecSpec(ident="afsk-noisy"),
    )
    got = _decoded_payloads(run_chain(chain, audio))
    assert got == sent


def test_upsample_poly_matches_scipy():
    """_upsample_poly reproduces scipy.signal.resample_poly(x, up, 1)
    exactly (the reference's afsk.py:164-165 branch)."""
    import jax.numpy as jnp
    from scipy.signal import resample_poly

    from pymodem_tpu.modems import _resample_poly_taps, _upsample_poly

    rng = np.random.default_rng(7)
    for up in (2, 3, 4):
        x = rng.standard_normal(777)
        want = resample_poly(x, up, 1)
        got = np.asarray(
            _upsample_poly(jnp.asarray(x, jnp.float64),
                           _resample_poly_taps(up), up)
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_afsk_output_oversample_roundtrip(rng):
    """output_oversample=2: demod stream (and slicer) run at 2x the input
    rate (afsk.py:146,164-165); the full chain still decodes."""
    sent = fx.payloads(rng, count=3, size=40)
    line = fx.il2p_line_bits(sent, polynomial=0x3, invert=False)
    audio = mod.afsk_modulate(line, 8000.0, 1200.0, 1200.0, 2200.0)
    modem = AFSKModemSpec(sample_rate=8000.0, output_oversample=2.0)
    assert modem.output_sample_rate == 16000.0
    chain = ChainSpec(
        name="afsk-ovs2",
        modem=modem,
        slicer=BinarySlicerSpec(sample_rate=16000.0, symbol_rate=1200.0,
                                lock_rate=0.75),
        stream=LFSRStreamSpec(polynomial=0x3, invert=False),
        codec=IL2PCodecSpec(ident="afsk-ovs2"),
    )
    seq = run_chain(chain, audio)
    got = _decoded_payloads(seq)
    assert got == sent

    # the banked runtime models the rate change (BlockPlan up/trim_post):
    # same packets at the same demod-rate stream addresses as the executor
    from pymodem_tpu.runtime.bank import run_banked

    banked = run_banked([chain], audio, block_seconds=2.0,
                        overlap_seconds=1.5)[chain.name]
    assert (
        [(p.streamaddress, bytes(p.data)) for p in banked]
        == [(p.streamaddress, bytes(p.data)) for p in seq]
    )
