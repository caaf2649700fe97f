"""Adversarial dedup semantics: the block runtime's widened windows must
never merge genuinely distinct packets, and packets straddling block edges
must be counted exactly once.

The banked runtime widens the reference's rate/40 correlation window by
16*sps and drops block-boundary repeats within 16*sps
(runtime/bank.py:_dedup_block_boundary, run_plan_banked).  The safety
argument: _dedup_block_boundary requires IDENTICAL payload bytes and
addresses within 16 symbol periods -- but two complete on-air packets'
end addresses always differ by at least the second packet's duration
(>= ~550 bits >> 16 symbols), so distinct transmissions can never land
inside the window; only block-boundary re-reports of the SAME packet can.
These tests pin that argument with synthesized adversarial audio.
"""

import numpy as np
import pytest

from pymodem_tpu.config import load_plan
from pymodem_tpu.runtime.bank import run_banked, run_plan_banked
from pymodem_tpu.synth import fixtures as fx
from pymodem_tpu.synth import modulate as mod

CONFIG = "/root/reference/configs/afsk_1200_il2p.json"
RATE = 44100


@pytest.fixture(scope="module")
def chain():
    plan = load_plan(CONFIG, RATE)
    return plan.chains[0]  # AFSK 1200 IL2P 1600/1800, poly 0x1


def _audio_for(chain, payloads, gap_bits):
    poly = chain.stream.polynomial if chain.stream else 0x1
    invert = bool(chain.stream.invert) if chain.stream else False
    line = fx.il2p_line_bits(payloads, polynomial=poly, invert=invert,
                             gap_bits=gap_bits)
    return mod.afsk_modulate(line, RATE, chain.modem.symbol_rate,
                             chain.modem.mark_freq, chain.modem.space_freq)


def test_identical_adjacent_packets_not_merged(chain):
    """The same payload transmitted twice in quick succession (gap of only
    100 bit times) must be reported twice -- the dedup window (16*sps) is
    far smaller than one packet duration, so back-to-back repeats of the
    same bytes survive."""
    payload = b"REPEATED PAYLOAD AAAA BBBB CCC"
    audio = _audio_for(chain, [payload, payload], gap_bits=100)
    out = run_banked([chain], audio, block_seconds=1.0, overlap_seconds=1.0)
    pkts = out[chain.name]
    assert len(pkts) == 2, [p.streamaddress for p in pkts]
    gap = pkts[1].streamaddress - pkts[0].streamaddress
    sps = chain.slicer.sample_rate / chain.slicer.symbol_rate
    assert gap > 16 * sps  # outside the dedup window by construction
    assert list(pkts[0].data) == list(pkts[1].data)


def test_distinct_adjacent_packets_both_kept(chain):
    """Two different payloads with minimal spacing: never merged by either
    the per-chain block dedup or the widened cross-chain correlate."""
    audio = _audio_for(
        chain, [b"PAYLOAD NUMBER ONE xxxxxxxxxx", b"PAYLOAD NUMBER TWO yyyyyyyyyy"],
        gap_bits=100,
    )
    plan = load_plan(CONFIG, RATE)
    result = run_plan_banked(plan, audio, RATE, block_seconds=1.0,
                             overlap_seconds=1.0)
    good = [p for p in result.aggregate.unique if p.valid_crc]
    assert len(good) == 2, [bytes(p.data) for p in good]
    datas = {bytes(p.data[16:-2]) for p in good}
    assert datas == {b"PAYLOAD NUMBER ONE xxxxxxxxxx",
                     b"PAYLOAD NUMBER TWO yyyyyyyyyy"}


def test_block_straddling_packets_counted_once(chain):
    """Tiny blocks (1 s) force every frame to straddle block edges; each
    must be attributed to exactly one block (keep-region + boundary dedup),
    in both the banked and sharded paths."""
    payloads = [f"FRAME NUMBER {i} padding pad".encode() for i in range(5)]
    audio = _audio_for(chain, payloads, gap_bits=300)
    out = run_banked([chain], audio, block_seconds=1.0, overlap_seconds=1.0)
    pkts = out[chain.name]
    assert len(pkts) == 5, [p.streamaddress for p in pkts]
    assert len({p.streamaddress for p in pkts}) == 5

    from pymodem_tpu.runtime.sharded import make_mesh, run_banked_sharded

    import jax

    if len(jax.devices()) >= 4:
        mesh = make_mesh(1, 4)
        sharded = run_banked_sharded([chain], audio, mesh,
                                     block_seconds=1.0, overlap_seconds=1.0)
        assert (
            [p.streamaddress for p in sharded[chain.name]]
            == [p.streamaddress for p in pkts]
        )


def test_streaming_no_double_report(chain):
    """Feeding the same audio in odd-sized chunks: feed()/flush() increments
    contain each straddling packet exactly once and equal packets()."""
    from pymodem_tpu.runtime.stream import StreamDecoder

    payloads = [f"STREAM FRAME {i} padding padd".encode() for i in range(4)]
    audio = _audio_for(chain, payloads, gap_bits=300)
    dec = StreamDecoder([chain], RATE, block_seconds=1.0, overlap_seconds=1.0,
                        blocks_per_step=2)
    fresh = []
    for lo in range(0, len(audio), 30011):
        fresh += dec.feed(audio[lo : lo + 30011])
    fresh += dec.flush()
    final = dec.packets()[chain.name]
    assert [p.streamaddress for p in fresh] == [p.streamaddress for p in final]
    assert len(final) == 4
