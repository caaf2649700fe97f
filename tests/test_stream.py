"""Streaming decoder: chunked feed == one-shot decode, bounded memory."""

import numpy as np
import pytest

from pymodem_tpu.config import load_plan
from pymodem_tpu.runtime.bank import run_banked
from pymodem_tpu.runtime.stream import StreamDecoder

CONFIG = "/root/reference/configs/afsk_300.json"


def _pairs(pkts):
    return [(p.streamaddress, list(p.data)) for p in pkts]


@pytest.mark.parametrize("chunk_len", [7_001, 80_000])
def test_stream_matches_oneshot(fixture_audio, chunk_len):
    import os

    if not os.path.exists(CONFIG):
        pytest.skip("reference configs not available")
    rate, audio = fixture_audio
    audio = audio[: rate * 80]
    plan = load_plan(CONFIG, rate)
    chains = [
        c for c in plan.chains
        if c.name in ("AFSK 300 Il2Pc PLL inverted", "AFSK 300 Il2Pc Correlator")
    ]
    oneshot = run_banked(chains, audio, block_seconds=4.0, overlap_seconds=6.0)

    dec = StreamDecoder(chains, rate, block_seconds=4.0, overlap_seconds=6.0,
                        blocks_per_step=4)
    streamed = []
    for i in range(0, len(audio), chunk_len):
        streamed.extend(dec.feed(audio[i : i + chunk_len]))
    streamed.extend(dec.flush())
    by_chain = dec.packets()

    # The reference AGC normalizes by the WHOLE recording's max (agc.py:67);
    # a stream cannot see the future, so coherent chains' loop dynamics (and
    # hence byte phase) may shift by up to one byte period vs one-shot.
    # Packet payloads must match exactly; addresses within that quantum.
    total = 0
    window = rate / 40 + 9 * (8000 / 300)
    for chain in chains:
        a = _pairs(oneshot[chain.name])
        b = _pairs(by_chain[chain.name])
        assert [d for _, d in a] == [d for _, d in b], chain.name
        for (addr_a, _), (addr_b, _) in zip(a, b):
            assert abs(addr_a - addr_b) < window
        total += len(b)
    assert total > 0

    # bounded memory: retained audio never exceeds the in-flight step
    # groups (committed cursor lags by up to pipeline_depth steps, whose
    # audio is kept so a failed collect can re-submit) plus halo
    assert len(dec._audio) <= (
        4 * 4 * (1 + dec.pipeline_depth) + 6 + 2
    ) * rate


def test_stream_checkpoint_resume(fixture_audio):
    """Kill-and-resume through a JSON checkpoint equals continuous decode."""
    import json
    import os

    if not os.path.exists(CONFIG):
        pytest.skip("reference configs not available")
    rate, audio = fixture_audio
    audio = audio[: rate * 60]
    plan = load_plan(CONFIG, rate)
    chains = [
        c for c in plan.chains
        if c.name in ("AFSK 300 Il2Pc PLL inverted", "AFSK 300 Il2Pc Correlator")
    ]

    def mk():
        return StreamDecoder(chains, rate, block_seconds=4.0,
                             overlap_seconds=6.0, blocks_per_step=2)

    chunks = [audio[i : i + 50_000] for i in range(0, len(audio), 50_000)]

    continuous = mk()
    got_cont = []
    for c in chunks:
        got_cont.extend(continuous.feed(c))
    got_cont.extend(continuous.flush())

    # decode half, checkpoint through JSON, resume in a NEW decoder
    first = mk()
    got = []
    kill_at = len(chunks) // 2
    for c in chunks[:kill_at]:
        got.extend(first.feed(c))
    blob = json.dumps(first.state())
    del first

    resumed = mk()
    resumed.restore(json.loads(blob))
    for c in chunks[kill_at:]:
        got.extend(resumed.feed(c))
    got.extend(resumed.flush())

    assert _pairs(got) == _pairs(got_cont)
    assert {
        n: _pairs(p) for n, p in resumed.packets().items()
    } == {n: _pairs(p) for n, p in continuous.packets().items()}
    assert len(got_cont) > 0


def test_stream_mixed_dtype_feeds(fixture_audio):
    """int16 chunks keep the int16 wire dtype; a float chunk mid-stream
    upcasts the carry and decode continues losslessly (int16 -> float is
    exact, so packets match an all-int16 stream)."""
    import os

    if not os.path.exists(CONFIG):
        pytest.skip("reference configs not available")
    rate, audio = fixture_audio
    audio = audio[: rate * 60]
    plan = load_plan(CONFIG, rate)
    chains = [c for c in plan.chains if c.name == "AFSK 300 Il2Pc Correlator"]

    kw = dict(block_seconds=4.0, overlap_seconds=6.0, blocks_per_step=4)
    dec_int = StreamDecoder(chains, rate, **kw)
    got_int = []
    for i in range(0, len(audio), 80_000):
        chunk = audio[i : i + 80_000]
        assert chunk.dtype == np.int16
        got_int.extend(dec_int.feed(chunk))
    got_int.extend(dec_int.flush())
    assert dec_int._audio.dtype == np.float64 or dec_int._audio.dtype == np.int16

    dec_mix = StreamDecoder(chains, rate, **kw)
    got_mix = []
    for fi, i in enumerate(range(0, len(audio), 80_000)):
        chunk = audio[i : i + 80_000]
        if fi % 2:  # alternate float feeds mid-stream
            chunk = chunk.astype(np.float64)
        got_mix.extend(dec_mix.feed(chunk))
    got_mix.extend(dec_mix.flush())

    assert _pairs(got_mix) == _pairs(got_int)
    assert len(got_int) > 0


def test_stream_device_tail_warm_path(fixture_audio):
    """Steady-state feeds take the device-resident-tail fast path: after
    the first step each submission consumes the previous step's tail
    (uploading only the new samples) and advances the tail cursor, and
    the cold/warm split changes no packet (the chunked-vs-oneshot
    equality above already pins payloads; this pins the tail
    mechanics)."""
    import os

    import jax

    if not os.path.exists(CONFIG):
        pytest.skip("reference configs not available")
    rate, audio = fixture_audio
    audio = audio[: rate * 60]
    plan = load_plan(CONFIG, rate)
    chains = [c for c in plan.chains
              if c.name == "AFSK 300 Il2Pc Correlator"]
    dec = StreamDecoder(chains, rate, block_seconds=4.0,
                        overlap_seconds=6.0, blocks_per_step=2)
    for s0 in range(0, len(audio), 10 * rate):
        dec.feed(audio[s0: s0 + 10 * rate])
    dec.drain()
    for st in dec._banks:
        assert st.tail is not None and st.tail_block > 0
        assert isinstance(st.tail, jax.Array)
        ext = st.plan.block_input_len - dec.block_len
        assert st.tail.shape == (ext,)
        # the cursor names the NEXT step the tail is positioned for
        assert st.tail_block == st.next_block
    dec.flush()
    assert sum(len(v) for v in dec.packets().values()) > 0
