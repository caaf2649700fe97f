"""Endurance: long streaming decode in bounded memory + checkpoint realism.

The reference holds the whole WAV in RAM per chain process (pymodem.py:46,
145) -- hours of audio means gigabytes and no recovery point.  The
streaming decoder must instead hold only its block-carry tail: this soak
feeds a long synthesized 96 kHz FSK stream chunk by chunk and asserts

* RSS stays bounded (no per-feed growth) over the whole run,
* a mid-stream checkpoint is compact (the audio tail serializes as
  compressed raw samples, not a JSON float list), and
* kill + restore mid-stream yields packets identical to the uninterrupted
  decode.

Duration scales with PYMODEM_TPU_SOAK_SECONDS (seconds of audio; default
180 keeps the suite habitable at CPU speeds, a true multi-hour soak is
PYMODEM_TPU_SOAK_SECONDS=7200 on real hardware).
"""

import json
import os
import resource

import numpy as np
import pytest

from pymodem_tpu.config import load_plan
from pymodem_tpu.runtime.stream import StreamDecoder
from pymodem_tpu.synth import fixtures as fx
from pymodem_tpu.synth import modulate as mod

CONFIG = "/root/reference/configs/fsk_9600.json"
SOAK_SECONDS = int(os.environ.get("PYMODEM_TPU_SOAK_SECONDS", 180))


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


@pytest.mark.slow
def test_stream_soak_bounded_memory_and_checkpoint():
    if not os.path.exists(CONFIG):
        pytest.skip("reference configs not available")
    rate = 96000
    plan = load_plan(CONFIG, rate)
    chain = plan.chains[0]
    rng = np.random.default_rng(5)
    sent, seg = fx.synthesize_for_chain(chain, rate, rng, n_frames=4,
                                        size=30, gap_bits=4000)
    seg16 = mod.to_int16(np.asarray(seg))
    frames_per_seg = len(sent)
    target = SOAK_SECONDS * rate
    n_segs = -(-target // len(seg16))

    def run(kill_at_seg: int | None):
        """Decode the stream; optionally checkpoint+restore mid-way.

        Returns (packets, max retained tail, checkpoint bytes, rss trace).
        """
        kw = dict(max_packet_seconds=0.2)
        dec = StreamDecoder([chain], rate, **kw)
        got = []
        max_tail = 0
        ckpt_size = 0
        rss = []
        for i in range(n_segs):
            got.extend(dec.feed(seg16))
            max_tail = max(max_tail, len(dec._audio))
            if i == kill_at_seg:
                blob = json.dumps(dec.state())
                ckpt_size = len(blob)
                del dec  # the "kill": only the JSON survives
                dec = StreamDecoder([chain], rate, **kw)
                dec.restore(json.loads(blob))
            if i % max(n_segs // 8, 1) == 0:
                rss.append(_rss_mb())
        got.extend(dec.flush())
        return got, max_tail, ckpt_size, rss

    baseline, max_tail, _ck, rss = run(kill_at_seg=None)
    assert len(baseline) >= frames_per_seg * (n_segs - 1)

    # bounded memory: the retained tail never exceeds the in-flight step
    # groups + halo (seconds, not hours), and RSS stops growing once the
    # pipeline reaches steady state (first sample after warm-up vs last)
    dec_probe = StreamDecoder([chain], rate, max_packet_seconds=0.2)
    bound = (
        dec_probe.blocks_per_step * dec_probe.block_len
        * (1 + dec_probe.pipeline_depth)
        + dec_probe.overlap + 2 * rate
    )
    assert max_tail <= bound, (max_tail, bound)
    if len(rss) >= 4:
        assert rss[-1] - rss[1] < 512, rss  # MB; steady state, not linear

    # checkpoint realism: kill mid-stream, restore into a new decoder,
    # finish -- identical packets to the uninterrupted run, compact blob
    resumed, _mt, ckpt_size, _rss = run(kill_at_seg=n_segs // 2)
    assert ckpt_size > 0 and ckpt_size <= 512 * 1024, ckpt_size
    key = lambda pkts: [(p.streamaddress, bytes(p.data)) for p in pkts]
    assert key(resumed) == key(baseline)
