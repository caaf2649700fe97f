"""Sharded runtime: ('chain', 'time') mesh parity with the single-device bank.

Runs on the 8 virtual CPU devices from conftest.  The sharded program must
produce the same packets as the single-device banked program -- the per-shard
computation is identical and the only collective (AGC global max) reproduces
the replicated value.
"""

import numpy as np
import pytest
from dataclasses import replace

import jax

from pymodem_tpu.config import load_plan
from pymodem_tpu.runtime.bank import run_banked
from pymodem_tpu.runtime.sharded import make_mesh, run_banked_sharded

CONFIG = "/root/reference/configs/afsk_300.json"


@pytest.fixture(scope="module")
def sweep_chains(fixture_audio):
    import os

    if not os.path.exists(CONFIG):
        pytest.skip("reference configs not available")
    rate, _ = fixture_audio
    plan = load_plan(CONFIG, rate)
    base = [c for c in plan.chains if c.name == "AFSK 300 Il2Pc Correlator"][0]
    return [
        replace(base, name=f"s{i}", modem=replace(base.modem, space_gain=1.0 + 0.1 * i))
        for i in range(2)
    ]


def test_sharded_matches_single_device(fixture_audio, sweep_chains):
    rate, audio = fixture_audio
    audio = audio[: rate * 60]  # one minute: 3+ blocks, fast in f64 on CPU
    mesh = make_mesh(2, 4)
    single = run_banked(sweep_chains, audio)
    sharded = run_banked_sharded(sweep_chains, audio, mesh)
    assert set(single) == set(sharded)
    total = 0
    for name in single:
        a = [(p.streamaddress, list(p.data)) for p in single[name]]
        b = [(p.streamaddress, list(p.data)) for p in sharded[name]]
        assert a == b
        total += len(b)
    assert total > 0  # the minute of audio contains packets


def test_pll_sharded_collective(fixture_audio):
    """AFSK-PLL (AGC + PLL scan) through the pmax collective path."""
    import os

    if not os.path.exists(CONFIG):
        pytest.skip("reference configs not available")
    rate, audio = fixture_audio
    plan = load_plan(CONFIG, rate)
    base = [c for c in plan.chains if c.name == "AFSK 300 Il2Pc PLL inverted"][0]
    chains = [
        replace(base, name=f"pll{i}",
                modem=replace(base.modem, carrier_freq=1700.0 + i))
        for i in range(2)
    ]
    audio = audio[: rate * 60]
    mesh = make_mesh(2, 4)
    single = run_banked(chains, audio)
    sharded = run_banked_sharded(chains, audio, mesh)
    total = 0
    for name in single:
        a = [(p.streamaddress, list(p.data)) for p in single[name]]
        b = [(p.streamaddress, list(p.data)) for p in sharded[name]]
        assert a == b
        total += len(b)
    assert total > 0


def test_qpsk_sharded_matches_single(rng):
    """IQ family (quadrature slicer) through the sharded path."""
    from pymodem_tpu.config import (
        ChainSpec,
        IL2PCodecSpec,
        LFSRStreamSpec,
        QuadratureSlicerSpec,
        _qpsk_preset,
    )
    from pymodem_tpu.synth import fixtures as fx
    from pymodem_tpu.synth import modulate as mod

    sent = fx.payloads(rng, count=4, size=30)
    line = fx.il2p_line_bits(sent, polynomial=0x1, invert=False, gap_bits=2000)
    spec = _qpsk_preset("2400", 44100.0)
    audio = mod.qpsk_modulate(line, 44100.0, 1200.0, spec.carrier_freq)
    chains = [
        ChainSpec(
            name=f"q{i}",
            modem=spec,
            slicer=QuadratureSlicerSpec(
                sample_rate=44100.0, symbol_rate=1200.0, lock_rate=0.9,
                bits_per_symbol=2, state_mask=0xF,
            ),
            stream=LFSRStreamSpec(polynomial=0x1, invert=False),
            codec=IL2PCodecSpec(ident=f"q{i}"),
        )
        for i in range(2)
    ]
    mesh = make_mesh(2, 4)
    single = run_banked(chains, audio, block_seconds=2.0, overlap_seconds=1.5)
    sharded = run_banked_sharded(chains, audio, mesh, block_seconds=2.0,
                                 overlap_seconds=1.5)
    total = 0
    for name in single:
        a = [(p.streamaddress, list(p.data)) for p in single[name]]
        b = [(p.streamaddress, list(p.data)) for p in sharded[name]]
        assert a == b
        total += len(b)
    assert total > 0


def test_per_shard_input_shape(fixture_audio, sweep_chains):
    """Audio is NOT replicated: each device's input shard holds only its own
    blocks' overlap-save windows (~n_audio/n_time plus per-block halo)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pymodem_tpu.runtime import bank as B
    from pymodem_tpu.runtime.sharded import frame_blocks_host

    rate, audio = fixture_audio
    audio = audio[: rate * 64]
    n_time = 4
    mesh = make_mesh(2, n_time)
    bank = B.group_chains(sweep_chains, jnp.float64)[0]
    plan = B.default_block_plan(len(audio), bank.trim, rate)
    assert plan.n_blocks % n_time == 0  # 64 s / 16 s blocks
    frames = frame_blocks_host(audio, plan)
    framed = jax.device_put(
        jnp.asarray(frames, jnp.float64), NamedSharding(mesh, P("time"))
    )
    blocks_per_shard = plan.n_blocks // n_time
    for shard in framed.addressable_shards:
        assert shard.data.shape == (blocks_per_shard, plan.block_input_len)
    # per-device input samples ~ n_audio/n_time + halo share, NOT n_audio
    per_device = blocks_per_shard * plan.block_input_len
    halo = blocks_per_shard * (plan.overlap + plan.trim)
    assert per_device <= len(audio) // n_time + halo + plan.block_len
    assert per_device < len(audio)  # strictly less than replication


def test_sharded_device_codec_matches(fixture_audio, sweep_chains):
    """codec='device' per-shard packet buffers == single-device device-codec
    run (the device-side packet gather path)."""
    rate, audio = fixture_audio
    audio = audio[: rate * 60]
    mesh = make_mesh(2, 4)
    single = run_banked(sweep_chains, audio, codec="device")
    sharded = run_banked_sharded(sweep_chains, audio, mesh, codec="device")
    total = 0
    for name in single:
        a = [(p.streamaddress, list(p.data)) for p in single[name]]
        b = [(p.streamaddress, list(p.data)) for p in sharded[name]]
        assert a == b
        total += len(b)
    assert total > 0


def test_pll_sharded_pallas_engine(fixture_audio, monkeypatch):
    """The per-shard program is the bank program: with the Pallas engines
    forced (interpreter mode on CPU), the sharded PLL decode still matches
    the single-device scan decode -- exercises the Pallas loop + windowed
    slicer kernels inside shard_map with the pmax normal collective."""
    import os

    if not os.path.exists(CONFIG):
        pytest.skip("reference configs not available")
    rate, audio = fixture_audio
    plan = load_plan(CONFIG, rate)
    base = [c for c in plan.chains if c.name == "AFSK 300 Il2Pc PLL inverted"][0]
    chains = [replace(base, name="pll0")]
    # 24 s = 2 blocks at the default fallback geometry (enough for the
    # time-axis shard + several packets); the Pallas INTERPRETER on CPU
    # costs ~6 s per simulated second, so length is suite time
    audio = audio[: rate * 24]
    single = run_banked(chains, audio)

    monkeypatch.setenv("PYMODEM_TPU_LOOP_ENGINE", "pallas")
    mesh = make_mesh(1, 2)
    sharded = run_banked_sharded(chains, audio, mesh)
    # the kernels compute in f32 while the scan reference here runs f64:
    # decisions match, but block-boundary byte phase may shift a packet's
    # address within the documented <= 16*sps dedup window (CLAUDE.md
    # architecture invariants)
    tol = 16 * 8000 / 300
    for name in single:
        a = [(p.streamaddress, list(p.data)) for p in single[name]]
        b = [(p.streamaddress, list(p.data)) for p in sharded[name]]
        assert len(a) == len(b) and a
        for (aa, da), (ab, db) in zip(a, b):
            assert da == db and abs(aa - ab) <= tol


def test_sharded_steady_state_single_gather(fixture_audio, sweep_chains):
    """The sharded device-codec steady state is ONE packed gather per bank
    and ZERO sizing readbacks: a repeat call with the same workload shape
    hits the per-shard budget cache, so demod -> codec -> compaction
    queue as one dispatch chain (VERDICT r2 item 1's 'done' criterion)."""
    from pymodem_tpu import profiling
    from pymodem_tpu.runtime import sharded as sh

    rate, audio = fixture_audio
    audio = audio[: rate * 60]
    mesh = make_mesh(2, 4)
    sh._SHARDED_BUDGET_CACHE.clear()
    first = run_banked_sharded(sweep_chains, audio, mesh, codec="device")
    profiling.reset()
    profiling.enable(True)
    try:
        again = run_banked_sharded(sweep_chains, audio, mesh, codec="device")
    finally:
        profiling.enable(False)
    c = profiling.counts()
    assert c.get("sharded_codec_transfer", 0) == 1  # ONE packed gather
    assert c.get("sharded_codec_sizing", 0) == 0  # budgets from the cache
    assert c.get("sharded_candidate_budget", 0) == 0
    assert c.get("sharded_codec_redo", 0) == 0
    for name in first:
        assert (
            [(p.streamaddress, list(p.data)) for p in first[name]]
            == [(p.streamaddress, list(p.data)) for p in again[name]]
        )
    assert any(first.values())


def test_oversample_sharded_matches_single(rng):
    """output_oversample chains shard too: BlockPlan's input-domain framing
    (stride_in/front_pad) is what frame_blocks_host shards over 'time', so
    the rate-changing demod needs no special casing in the mesh path."""
    from pymodem_tpu.config import (
        AFSKModemSpec,
        BinarySlicerSpec,
        ChainSpec,
        IL2PCodecSpec,
        LFSRStreamSpec,
    )
    from pymodem_tpu.synth import fixtures as fx
    from pymodem_tpu.synth import modulate as mod

    rate = 8000.0
    sent = fx.payloads(rng, count=6, size=30)
    line = fx.il2p_line_bits(sent, polynomial=0x3, invert=False,
                             gap_bits=4000)
    audio = mod.afsk_modulate(line, rate, 1200.0, 1200.0, 2200.0)
    chains = [
        ChainSpec(
            name=f"ovs{i}",
            modem=AFSKModemSpec(sample_rate=rate, output_oversample=2.0,
                                space_gain=1.0 + 0.05 * i),
            slicer=BinarySlicerSpec(sample_rate=2 * rate, symbol_rate=1200.0,
                                    lock_rate=0.75),
            stream=LFSRStreamSpec(polynomial=0x3, invert=False),
            codec=IL2PCodecSpec(ident=f"ovs{i}"),
        )
        for i in range(2)
    ]
    mesh = make_mesh(2, 4)
    single = run_banked(chains, audio, block_seconds=2.0,
                        overlap_seconds=1.5)
    sharded = run_banked_sharded(chains, audio, mesh, block_seconds=2.0,
                                 overlap_seconds=1.5)
    # the mesh path rounds n_blocks up to the time axis, shifting block
    # boundaries: identical packets may decode at a byte phase within the
    # documented dedup window (CLAUDE.md architecture invariants)
    tol = 16 * (2 * rate) / 1200.0
    total = 0
    for name in single:
        a = [(p.streamaddress, list(p.data)) for p in single[name]]
        b = [(p.streamaddress, list(p.data)) for p in sharded[name]]
        assert len(a) == len(b)
        for (aa, da), (ab, db) in zip(a, b):
            assert da == db and abs(aa - ab) <= tol
        total += len(b)
    assert total >= 6


def test_mixed_codec_and_padded_chain_count(rng):
    """Round-5 sharded feature parity (_reorder_pad_bank): a bank mixing
    ax25 + il2p codec options over a shared demod family, with a chain
    count (3) that does NOT divide the mesh chain axis (2), decodes via
    the per-sub-group device codec -- zero host_codec hits -- and matches
    the single-device runtime packet for packet."""
    from pymodem_tpu import profiling
    from pymodem_tpu.config import (
        AFSKModemSpec,
        AX25CodecSpec,
        BinarySlicerSpec,
        ChainSpec,
        IL2PCodecSpec,
        LFSRStreamSpec,
    )
    from pymodem_tpu.runtime import sharded as sh
    from pymodem_tpu.synth import fixtures as fx
    from pymodem_tpu.synth import modulate as mod

    rate = 8000.0
    segs = [
        mod.afsk_modulate(
            fx.il2p_line_bits(fx.payloads(rng, count=3, size=24),
                              polynomial=0x3, invert=False, gap_bits=2000),
            rate, 1200.0, 1200.0, 2200.0),
        mod.afsk_modulate(
            fx.il2p_line_bits(fx.payloads(rng, count=3, size=24),
                              polynomial=0x3, invert=True, gap_bits=2000),
            rate, 1200.0, 1200.0, 2200.0),
        mod.afsk_modulate(
            fx.ax25_line_bits(fx.payloads(rng, count=3, size=24),
                              polynomial=0x3, invert=False, gap_bits=2000),
            rate, 1200.0, 1200.0, 2200.0),
    ]
    audio = np.concatenate(segs).astype(np.float32)

    def mk(name, codec, invert):
        return ChainSpec(
            name=name,
            modem=AFSKModemSpec(sample_rate=rate),
            slicer=BinarySlicerSpec(sample_rate=rate, symbol_rate=1200.0,
                                    lock_rate=0.75),
            stream=LFSRStreamSpec(polynomial=0x3, invert=invert),
            codec=codec,
        )

    chains = [
        mk("i0", IL2PCodecSpec(ident="i0"), False),
        mk("i1", IL2PCodecSpec(ident="i1"), True),
        mk("a0", AX25CodecSpec(ident="a0"), False),
    ]
    kw = dict(codec="device", block_seconds=1.0, overlap_seconds=0.6)
    single = run_banked(chains, audio, dtype=np.float32, **kw)
    mesh = make_mesh(2, 4)
    sh._SHARDED_BUDGET_CACHE.clear()
    first = run_banked_sharded(chains, audio, mesh, dtype=np.float32, **kw)
    profiling.reset()
    profiling.enable(True)
    try:
        again = run_banked_sharded(chains, audio, mesh, dtype=np.float32,
                                   **kw)
    finally:
        profiling.enable(False)
    counts = profiling.counts()
    assert counts.get("host_codec", 0) == 0, counts
    assert counts.get("sharded_codec_sizing", 0) == 0, counts  # cached
    assert set(first) == {"i0", "i1", "a0"}  # no __pad leakage
    total = 0
    for name in first:
        a = [(p.streamaddress, bytes(p.data)) for p in single[name]]
        b = [(p.streamaddress, bytes(p.data)) for p in first[name]]
        b2 = [(p.streamaddress, bytes(p.data)) for p in again[name]]
        assert a == b == b2, name
        total += len(b)
    assert total >= 9
