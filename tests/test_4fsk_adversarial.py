"""Adversarial 4FSK vectors: the four-level slicer is the one decision
path with no runnable reference oracle (slicer.py:329-441 crashes on
undefined imports), so this module pins its semantics three ways:

* a pure-Python mirror of the reference's decision logic
  (slicer.py:329-441, fix-forward like ops/slicers.four_level_slice)
  differentially tested against the scan implementation on structured and
  random streams -- including threshold re-arm (0x5555/0xCCCC),
  clock-2 re-phasing, and zero-crossing lock;
* amplitude-step / gap / desync fixtures through the full banked chain
  (threshold must re-learn from the 8-deep ring on the new sync pattern);
* a noise ramp establishing the decode-through-noise envelope.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pymodem_tpu.config import load_plan
from pymodem_tpu.ops.slicers import four_level_slice
from pymodem_tpu.runtime.bank import run_banked
from pymodem_tpu.synth import fixtures as fx
from pymodem_tpu.synth import modulate as mod

CONFIG = "/root/reference/configs/4fsk_9600.json"
RATE = 48000


def _four_level_mirror(samples, sps, lock_rate, demap, initial_threshold):
    """Python mirror of the reference 4-level slicer decision loop
    (slicer.py:329-441): two phase clocks, 0x5555/0xCCCC sync arming the
    threshold from an 8-deep |sample| ring and re-phasing clock 2,
    zero-crossing lock on clock 1.  Envelope detectors omitted (they feed
    only the reference's plots)."""
    rollover = sps / 2.0 - 0.5
    ring = [0.0] * 8
    ring_index = 0
    clock1 = clock2 = 0.0
    sync = 0
    threshold = initial_threshold
    byte = 0
    bit_count = 0
    last = 0.0
    out = []
    for i, x in enumerate(samples):
        clock1 += 1.0
        if clock1 > rollover:
            clock1 -= sps
            ring_index += 1
            if ring_index >= 8:
                ring_index = 0
            ring[ring_index] = abs(x) * 2.0 / 3.0
            sync = (sync << 1) & 0xFFFF
            if x > 0:
                sync += 1
            if sync in (0x5555, 0xCCCC):
                threshold = sum(ring) / 8
                clock2 = clock1
        clock2 += 1.0
        if clock2 > rollover:
            clock2 -= sps
            byte = (byte << 2) & 0xFF
            if x > 0:
                symbol = 3 if x >= threshold else 2
            else:
                symbol = 0 if x <= -threshold else 1
            byte += demap[symbol]
            bit_count += 2
            if bit_count >= 8:
                bit_count = 0
                out.append((i + 1, byte))  # 1-based stream address
        if (last < 0.0 and x >= 0.0) or (last >= 0.0 and x < 0.0):
            clock1 *= lock_rate
        last = x
    return out


def _scan_emissions(samples, sps, lock_rate, demap, initial_threshold=0.0):
    res = four_level_slice(
        jnp.asarray(samples, jnp.float64), jnp.float64(sps),
        jnp.float64(lock_rate), jnp.asarray(demap, jnp.int32),
        jnp.float64(initial_threshold),
    )
    valid = np.asarray(res.valid)
    byte = np.asarray(res.byte)
    idx = np.nonzero(valid)[0]
    return [(int(i) + 1, int(byte[i])) for i in idx]


DEMAP = (2, 0, 3, 1)  # slicer.py:270 symbol_map [1, 3, -1, -3] inverse


def _symbol_wave(levels, sps):
    return np.repeat(np.asarray(levels, np.float64), int(sps))


def test_mirror_parity_structured(rng):
    """Scan slicer == reference-logic mirror on a structured stream:
    +3/-3 sync preamble (arms 0x5555), 4-level payload, amplitude step,
    a second sync burst (re-arm), then low-amplitude payload."""
    sps = 5.0
    levels = [3, -3] * 20                       # arms sync at amp 1.0
    levels += [1, -1, 3, -3, 1, 3, -1, -3] * 6  # mixed payload
    levels += [0.25 * v for v in (3, -3) * 20]  # re-arm at amp 0.25
    levels += [0.25 * v for v in (1, -1, 3, 1, -3, -1) * 6]
    wave = _symbol_wave(levels, sps)
    wave += 0.01 * rng.standard_normal(len(wave))  # exercise the PLL lock
    want = _four_level_mirror(wave, sps, 0.985, DEMAP, 0.0)
    got = _scan_emissions(wave, sps, 0.985, DEMAP)
    assert want and got == want


def test_mirror_parity_random(rng):
    """Scan slicer == mirror on adversarial random noise (no structure:
    sync register, ring buffer, both clocks and the crossing lock all
    exercise arbitrary interleavings)."""
    for trial in range(3):
        wave = rng.standard_normal(4000) * rng.uniform(0.1, 10.0)
        sps = float(rng.uniform(3.0, 12.0))
        lock = float(rng.uniform(0.9, 1.0))
        want = _four_level_mirror(wave, sps, lock, DEMAP, 0.5)
        got = _scan_emissions(wave, sps, lock, DEMAP, 0.5)
        assert got == want, trial


def test_threshold_rearm_decodes_both_amplitudes(rng):
    """Frames at amplitude A then at A/4 with silence between: the second
    burst's 0x5555 preamble must re-learn the threshold from the ring
    (slicer.py:380-389) or its inner symbols (|x| < old threshold * 1/3)
    would all slice wrong."""
    import os

    if not os.path.exists(CONFIG):
        pytest.skip("reference configs not available")
    plan = load_plan(CONFIG, RATE)
    chain = plan.chains[0]
    sps = RATE / chain.slicer.symbol_rate

    def burst(payloads, amplitude):
        line = fx.il2p_line_bits(payloads, polynomial=0x1, invert=False,
                                 gap_bits=1200)
        dibits = [(a << 1) | b for a, b in zip(line[::2], line[1::2])]
        return mod.four_level_modulate(
            dibits, RATE, chain.slicer.symbol_rate, amplitude=amplitude
        )

    sent_hi = fx.payloads(rng, count=2, size=24)
    sent_lo = fx.payloads(rng, count=2, size=24)
    silence = np.zeros(int(60 * sps))
    audio = np.concatenate(
        [burst(sent_hi, 10000.0), silence, burst(sent_lo, 2500.0)]
    )
    pkts = run_banked([chain], audio, block_seconds=4.0,
                      overlap_seconds=3.0)[chain.name]
    payloads = {bytes(p.data[16:-2]) for p in pkts}
    for p in sent_hi + sent_lo:
        assert p in payloads


def test_gap_desync_recovery(rng):
    """A noise burst with no symbol structure between frames scrambles the
    sync register and drags the threshold ring; the next frame's preamble
    must recover both."""
    import os

    if not os.path.exists(CONFIG):
        pytest.skip("reference configs not available")
    plan = load_plan(CONFIG, RATE)
    chain = plan.chains[0]

    def burst(payloads):
        line = fx.il2p_line_bits(payloads, polynomial=0x1, invert=False,
                                 gap_bits=1200)
        dibits = [(a << 1) | b for a, b in zip(line[::2], line[1::2])]
        return mod.four_level_modulate(dibits, RATE,
                                       chain.slicer.symbol_rate)

    sent_a = fx.payloads(rng, count=2, size=24)
    sent_b = fx.payloads(rng, count=2, size=24)
    noise = 20000.0 * rng.standard_normal(RATE // 2)  # hotter than signal
    audio = np.concatenate([burst(sent_a), noise, burst(sent_b)])
    pkts = run_banked([chain], audio, block_seconds=4.0,
                      overlap_seconds=3.0)[chain.name]
    payloads = {bytes(p.data[16:-2]) for p in pkts}
    for p in sent_a + sent_b:
        assert p in payloads


def test_noise_ramp_envelope(rng):
    """Decode-through-noise envelope: every frame recovers at >= 16 dB
    SNR; the run degrades (rather than crashes) below that."""
    import os

    if not os.path.exists(CONFIG):
        pytest.skip("reference configs not available")
    plan = load_plan(CONFIG, RATE)
    chain = plan.chains[0]
    sent = fx.payloads(rng, count=3, size=24)
    line = fx.il2p_line_bits(sent, polynomial=0x1, invert=False,
                             gap_bits=1200)
    dibits = [(a << 1) | b for a, b in zip(line[::2], line[1::2])]
    clean = mod.four_level_modulate(dibits, RATE, chain.slicer.symbol_rate)
    for snr_db, expect_all in ((30.0, True), (16.0, True), (-6.0, False)):
        audio = mod.awgn(clean, snr_db, rng)
        pkts = run_banked([chain], audio, block_seconds=4.0,
                          overlap_seconds=3.0)[chain.name]
        for p in pkts:
            p.validate()  # CRC/header flags (aggregate.validate_all form)
        good = {
            bytes(p.data[16:-2]) for p in pkts
            if p.valid_crc and p.valid_header
        }
        if expect_all:
            for p in sent:
                assert p in good, snr_db
        # low SNR: the contract is graceful degradation -- CRC-failed
        # frames are fine (reported as rejections, like the reference),
        # but every CRC-VALID frame must be a real transmitted payload
        assert good <= set(sent), snr_db
