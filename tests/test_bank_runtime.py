"""Banked block-parallel runtime: parity with the sequential executor.

The banked path (runtime/bank.py) must reproduce the sequential golden
packet sets on the fixture WAV: identical CRC sequences, addresses within
the correlation window plus one byte-phase quantum (block slicers count
byte boundaries from the block start, so reported addresses may shift by
up to 7 symbol periods; both codecs are bit-serial so packets themselves
are unaffected -- see runtime/bank.py docstring).
"""

import os

import numpy as np
import pytest

from pymodem_tpu.config import load_plan
from pymodem_tpu.runtime.bank import (
    BlockPlan,
    default_block_plan,
    frame_blocks,
    run_plan_banked,
)

from golden_afsk300 import GOLDEN_5CHAIN, GOLDEN_PLL

CONFIG_DIR = "/root/reference/configs"


def test_block_plan_covers_stream():
    plan = BlockPlan(n_audio=100_000, trim=500, block_len=16_000, overlap=4_000)
    assert plan.n_demod == 99_500
    ranges = [plan.keep_range(b) for b in range(plan.n_blocks)]
    # keep ranges tile (0, n_demod] exactly
    assert ranges[0][0] == 0
    assert ranges[-1][1] == plan.n_demod
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi == lo


def test_plan_bank_run_lane_alignment():
    """Auto geometry snaps long recordings onto the Pallas lane-tile
    quanta (per-step chains x blocks-per-group in {1024, 2048} exactly --
    unaligned counts pad up to the next 1024 rows inside the kernels and
    waste up to half the loop kernel), keeps the halo tax under ~1.67,
    and falls back to the unaligned heuristics when the recording cannot
    fill a quantum."""
    import jax.numpy as jnp

    from pymodem_tpu.config import load_plan as _lp
    from pymodem_tpu.runtime.bank import group_chains, plan_bank_run

    rate = 8000
    plan_cfg = _lp(os.path.join(CONFIG_DIR, "afsk_300.json"), rate)
    from dataclasses import replace

    base = [c for c in plan_cfg.chains
            if c.name == "AFSK 300 Il2Pc PLL inverted"][0]
    for n_chains in (8, 32):
        chains = [
            replace(base, name=f"p{i}",
                    modem=replace(base.modem, carrier_freq=1696.0 + i))
            for i in range(n_chains)
        ]
        bank = group_chains(chains, jnp.float32)[0]
        plan, group = plan_bank_run(
            bank, 3600 * rate, rate, jnp.float32, "auto", "auto", 3.0,
            "auto",
        )
        lanes = n_chains * (group or plan.n_blocks)
        assert lanes in (1024, 2048), lanes
        halo = (plan.block_len + plan.overlap) / plan.block_len
        assert halo <= 1.67
        # every keep-range still tiles the stream exactly
        assert plan.keep_range(plan.n_blocks - 1)[1] == plan.n_demod
        # a recording too short to fill a quantum falls back (and the
        # fallback never explodes the block count)
        short_plan, short_group = plan_bank_run(
            bank, 60 * rate, rate, jnp.float32, "auto", "auto", 3.0, "auto",
        )
        assert n_chains * (short_group or short_plan.n_blocks) < 1024
    # explicit geometry is untouched by alignment
    bank = group_chains(chains[:8], jnp.float32)[0]
    plan, group = plan_bank_run(
        bank, 3600 * rate, rate, jnp.float32, 16.0, 6.0, None, None,
    )
    assert plan.block_len == 16 * rate and plan.overlap == 6 * rate
    assert group is None


def test_afsk_sweep_shared_demod_matches_per_chain(fixture_audio):
    """A pure space_gain sweep demods as ONE chain's convolutions plus a
    per-chain scalar combine (bank._afsk_bank_demod_shared): packets must
    match the per-chain demod form exactly on the fixture (f32; the only
    difference is scalar-reassociation ulps)."""
    from dataclasses import replace

    import jax.numpy as jnp

    from pymodem_tpu.runtime import bank as B
    from pymodem_tpu.runtime.bank import run_banked

    rate, audio = fixture_audio
    plan = load_plan(os.path.join(CONFIG_DIR, "afsk_300.json"), rate)
    base = [c for c in plan.chains if c.name == "AFSK 300 Il2Pc Correlator"][0]
    # the fixture decodes only at space_gain ~1.0 (the bench's 64-chain
    # sweep expects exactly one chain's packets); 1.0 deliberately NOT
    # in row 0, so the scale renormalization (s_c/s_0) is exercised
    chains = [
        replace(base, name=f"s{i}",
                modem=replace(base.modem, space_gain=g))
        for i, g in enumerate((0.99, 1.0, 1.01, 1.02))
    ]
    audio = audio[: rate * 60]
    banks = B.group_chains(chains, jnp.float32)
    assert len(banks) == 1 and "space_scale" in banks[0].params
    shared = run_banked(chains, audio, dtype=jnp.float32, codec="host")

    orig = B._afsk_shared_scales
    try:
        B._afsk_shared_scales = lambda specs: None
        per_chain = run_banked(chains, audio, dtype=jnp.float32,
                               codec="host")
    finally:
        B._afsk_shared_scales = orig
    assert set(shared) == set(per_chain)
    for name in shared:
        a = [(p.streamaddress, list(p.data)) for p in shared[name]]
        b = [(p.streamaddress, list(p.data)) for p in per_chain[name]]
        assert a == b
    assert any(shared[n] for n in shared)


def test_plan_bank_run_oversample_alignment():
    """The aligned auto geometry with output_oversample chains: block
    lengths stay multiples of ``up`` (every block starts on an input
    sample phase), the lane quantum still lands exactly, and keep ranges
    tile the demod stream."""
    import jax.numpy as jnp

    from pymodem_tpu.config import (
        AFSKModemSpec,
        BinarySlicerSpec,
        ChainSpec,
        IL2PCodecSpec,
        LFSRStreamSpec,
    )
    from pymodem_tpu.runtime.bank import group_chains, plan_bank_run

    rate = 8000.0
    for up in (2, 3):
        chains = [
            ChainSpec(
                name=f"ovs{up}-{i}",
                modem=AFSKModemSpec(sample_rate=rate,
                                    output_oversample=float(up),
                                    space_gain=1.0 + 0.01 * i),
                slicer=BinarySlicerSpec(sample_rate=rate * up,
                                        symbol_rate=1200.0, lock_rate=0.75),
                stream=LFSRStreamSpec(polynomial=0x3, invert=False),
                codec=IL2PCodecSpec(ident=f"o{up}{i}"),
            )
            for i in range(8)
        ]
        bank = group_chains(chains, jnp.float32)[0]
        assert bank.up == up
        n_audio = int(3600 * rate)
        plan, group = plan_bank_run(
            bank, n_audio, rate, jnp.float32, "auto", "auto", 1.0, "auto",
        )
        assert plan.block_len % up == 0 and plan.overlap % up == 0
        lanes = 8 * (group or plan.n_blocks)
        assert lanes in (1024, 2048), lanes
        assert plan.keep_range(plan.n_blocks - 1)[1] == plan.n_demod


def test_sweep_sharing_detection_negatives():
    """Sweep sharing must NOT trigger when any demod-relevant field
    differs: space_gain sweeps with a detuned correlator keep per-chain
    demods, and coherent banks with differing filters keep per-chain
    pre-loop pipelines (only pure carrier sweeps share)."""
    from dataclasses import replace

    import jax.numpy as jnp

    from pymodem_tpu.runtime.bank import group_chains

    plan_cfg = load_plan(os.path.join(CONFIG_DIR, "afsk_300.json"), 8000)
    corr = [c for c in plan_cfg.chains
            if c.name == "AFSK 300 Il2Pc Correlator"][0]
    pll = [c for c in plan_cfg.chains
           if c.name == "AFSK 300 Il2Pc PLL inverted"][0]

    # space sweep + a correlator_offset detune: linearity no longer holds
    chains = [
        replace(corr, name=f"n{i}",
                modem=replace(corr.modem, space_gain=1.0 + 0.01 * i,
                              correlator_offset=float(i)))
        for i in range(4)
    ]
    bank = group_chains(chains, jnp.float32)[0]
    assert "space_scale" not in bank.params

    # zero/negative gains: magnitude linearity needs g > 0
    chains = [
        replace(corr, name=f"z{i}",
                modem=replace(corr.modem, space_gain=g))
        for i, g in enumerate((1.0, -1.0))
    ]
    bank = group_chains(chains, jnp.float32)[0]
    assert "space_scale" not in bank.params

    # coherent bank with differing input BPF: pre-loop stages differ
    chains = [
        replace(pll, name=f"b{i}",
                modem=replace(pll.modem,
                              input_bpf_low_cutoff=1200.0 + 10.0 * i))
        for i in range(2)
    ]
    bank = group_chains(chains, jnp.float32)[0]
    assert "pre_shared" not in bank.params

    # pure carrier sweep: pre-loop stages DO share
    chains = [
        replace(pll, name=f"c{i}",
                modem=replace(pll.modem, carrier_freq=1696.0 + i))
        for i in range(2)
    ]
    bank = group_chains(chains, jnp.float32)[0]
    assert "pre_shared" in bank.params


def test_frame_blocks_alignment():
    import jax.numpy as jnp

    audio = np.arange(1, 50_001, dtype=np.float64)
    plan = BlockPlan(n_audio=50_000, trim=100, block_len=10_000, overlap=2_000)
    blocks = np.asarray(frame_blocks(jnp.asarray(audio), plan))
    assert blocks.shape == (plan.n_blocks, plan.block_input_len)
    # block b, position k holds audio[b*block_len - overlap + k] (zero pad)
    assert blocks[0, 0] == 0.0  # front halo
    assert blocks[0, plan.overlap] == audio[0]
    assert blocks[1, 0] == audio[plan.block_len - plan.overlap]
    assert blocks[2, plan.overlap] == audio[2 * plan.block_len]


@pytest.mark.parametrize(
    "config,golden",
    [("afsk_300_pll.json", GOLDEN_PLL), ("afsk_300.json", GOLDEN_5CHAIN)],
    ids=["pll_2chain", "mixed_5chain"],
)
def test_banked_decode_parity(fixture_audio, config, golden):
    path = os.path.join(CONFIG_DIR, config)
    if not os.path.exists(path):
        pytest.skip("reference configs not available")
    rate, audio = fixture_audio
    plan = load_plan(path, rate)
    result = run_plan_banked(plan, audio, rate)
    ours = [
        (p.streamaddress, p.calculated_crc)
        for p in result.aggregate.unique
        if p.valid_crc and p.valid_header
    ]
    assert [crc for _, crc in ours] == [crc for _, crc in golden]
    window = rate / 40 + 8 * (8000 / 300)  # dedup window + byte-phase shift
    for (addr, _), (gold_addr, _) in zip(ours, golden):
        assert abs(addr - gold_addr) < window


def test_banked_device_codec_parity(fixture_audio):
    """codec='device' matches codec='host' on the fixture (PLL + correlator)."""
    from pymodem_tpu.runtime.bank import run_banked

    path = os.path.join(CONFIG_DIR, "afsk_300.json")
    if not os.path.exists(path):
        pytest.skip("reference configs not available")
    rate, audio = fixture_audio
    plan = load_plan(path, rate)
    chains = [c for c in plan.chains
              if c.name in ("AFSK 300 Il2Pc PLL inverted", "AFSK 300 Il2Pc Correlator")]
    host = run_banked(chains, audio, codec="host")
    device = run_banked(chains, audio, codec="device")
    for name in host:
        a = [(p.streamaddress, list(p.data), p.bytes_corrected) for p in host[name]]
        b = [(p.streamaddress, list(p.data), p.bytes_corrected) for p in device[name]]
        assert a == b, name


def test_multi_file_batch_matches_per_file(fixture_audio):
    """run_banked_files == per-file run_banked, one device program."""
    from pymodem_tpu.runtime.bank import run_banked, run_banked_files

    path = os.path.join(CONFIG_DIR, "afsk_300.json")
    if not os.path.exists(path):
        pytest.skip("reference configs not available")
    rate, audio = fixture_audio
    plan = load_plan(path, rate)
    chains = [c for c in plan.chains if c.name == "AFSK 300 Il2Pc Correlator"]
    # different lengths: per-file block counts (and device-codec template
    # program shapes) differ; the short third file exercises keep-clipping
    files = [audio[: rate * 60], audio[rate * 30 : rate * 90],
             audio[: rate * 40]]
    batched = run_banked_files(chains, files)  # device codec default
    hosted = run_banked_files(chains, files, codec="host")
    for fi, f_audio in enumerate(files):
        solo = run_banked(chains, f_audio)
        for name in solo:
            a = [(p.streamaddress, list(p.data)) for p in solo[name]]
            b = [(p.streamaddress, list(p.data)) for p in batched[fi][name]]
            c = [(p.streamaddress, list(p.data)) for p in hosted[fi][name]]
            assert a == b == c, (fi, name)
        assert any(batched[fi].values())


def test_run_banked_many_pipelined_matches_sequential(fixture_audio):
    """run_banked_many (serving pipeline: next recording's programs
    dispatched before this one's readback) returns exactly what per-file
    run_banked returns, including across different-length recordings and
    for both codec paths in one call (PLL+correlator = 2 banks, one of
    which is the device codec)."""
    from pymodem_tpu.runtime.bank import run_banked, run_banked_many

    path = os.path.join(CONFIG_DIR, "afsk_300.json")
    if not os.path.exists(path):
        pytest.skip("reference configs not available")
    rate, audio = fixture_audio
    plan = load_plan(path, rate)
    chains = [c for c in plan.chains
              if c.name in ("AFSK 300 Il2Pc PLL inverted",
                            "AFSK 300 Il2Pc Correlator")]
    audios = [audio[: rate * 60], audio[rate * 30 : rate * 100],
              audio[: rate * 60]]
    piped = run_banked_many(chains, audios, depth=2)

    def pkts(res):
        return {
            n: [(p.streamaddress, list(p.data)) for p in v]
            for n, v in res.items()
        }

    assert len(piped) == len(audios)
    for a, got in zip(audios, piped):
        assert pkts(got) == pkts(run_banked(chains, a))
    assert any(piped[0].values())


def test_budget_cache_speculative_path_matches(fixture_audio):
    """A repeat device-codec call runs on CACHED budgets (zero pre-readback
    sync points) and returns the identical packet set; a poisoned cache
    entry with too-small compaction budgets is detected from the packed
    sizes and redone exactly -- correctness never depends on the cache."""
    from pymodem_tpu.runtime import bank as B
    from pymodem_tpu.runtime.bank import run_banked

    path = os.path.join(CONFIG_DIR, "afsk_300.json")
    if not os.path.exists(path):
        pytest.skip("reference configs not available")
    rate, audio = fixture_audio
    plan = load_plan(path, rate)
    chains = [c for c in plan.chains if c.name == "AFSK 300 Il2Pc Correlator"]
    audio = audio[: rate * 60]

    B._CODEC_BUDGET_CACHE.clear()
    first = run_banked(chains, audio, codec="device")
    assert B._CODEC_BUDGET_CACHE, "exact path should seed the budget cache"
    (key, seeded), = B._CODEC_BUDGET_CACHE.items()
    second = run_banked(chains, audio, codec="device")
    assert B._CODEC_BUDGET_CACHE[key] == seeded  # clean hit, no eviction

    def pkts(res):
        return {
            n: [(p.streamaddress, list(p.data)) for p in v]
            for n, v in res.items()
        }

    assert pkts(second) == pkts(first)
    assert any(first.values())

    # poison the compaction budgets: meta_budget/len_budget far too small
    # for the real packet population -> overflow detected -> exact redo
    mp, cand_budget, scan_cap, _, _, rs_frac, pay = seeded
    B._CODEC_BUDGET_CACHE[key] = (
        mp, cand_budget, scan_cap, 1, 64, rs_frac, pay
    )
    redone = run_banked(chains, audio, codec="device")
    assert pkts(redone) == pkts(first)
    B._CODEC_BUDGET_CACHE.clear()


@pytest.mark.parametrize("codec", ["host", "device"])
def test_grouped_dispatch_matches_single(fixture_audio, codec):
    """max_blocks_per_step (bank_device_step_grouped: one lax.map program,
    native-dtype upload) == one-shot dispatch, both codecs, int16 audio."""
    from pymodem_tpu.runtime.bank import run_banked

    path = os.path.join(CONFIG_DIR, "afsk_300.json")
    if not os.path.exists(path):
        pytest.skip("reference configs not available")
    rate, audio = fixture_audio
    plan = load_plan(path, rate)
    chains = [c for c in plan.chains if c.name == "AFSK 300 Il2Pc Correlator"]
    audio = audio[: rate * 80]
    one = run_banked(chains, audio, codec=codec)
    grouped = run_banked(chains, audio, codec=codec, max_blocks_per_step=2)
    for name in one:
        a = [(p.streamaddress, list(p.data)) for p in one[name]]
        b = [(p.streamaddress, list(p.data)) for p in grouped[name]]
        assert a == b, name
    assert any(one.values())


def test_tiled_codec_submission_matches_single(fixture_audio, monkeypatch):
    """_submit_codec_tiled (codec stage split into block-range tiles with
    threaded collects; device keep filter evaluated at true global block
    indices via keep_globals) == the one-shot codec submission.  The real
    trigger is hour-scale single-dispatch recordings (>= 96 blocks); the
    threshold is lowered here so the short fixture exercises the tile
    path, including an uneven final tile."""
    import pymodem_tpu.runtime.bank as B
    from pymodem_tpu.runtime.bank import run_banked

    path = os.path.join(CONFIG_DIR, "afsk_300.json")
    if not os.path.exists(path):
        pytest.skip("reference configs not available")
    rate, audio = fixture_audio
    plan = load_plan(path, rate)
    chains = [c for c in plan.chains if "Il2Pc Correlator" in c.name]
    audio = audio[: rate * 80]
    monkeypatch.setattr(B, "_CODEC_TILE_MIN_BLOCKS", 10**9)
    one = run_banked(chains, audio, codec="device")
    B._CODEC_BUDGET_CACHE.clear()
    monkeypatch.setattr(B, "_CODEC_TILE_MIN_BLOCKS", 2)
    monkeypatch.setattr(B, "_CODEC_TILES", 3)
    tiled = run_banked(chains, audio, codec="device")
    B._CODEC_BUDGET_CACHE.clear()
    for name in one:
        a = [(p.streamaddress, list(p.data)) for p in one[name]]
        b = [(p.streamaddress, list(p.data)) for p in tiled[name]]
        assert a == b, name
    assert any(one.values())


@pytest.mark.parametrize("up", [2, 3])
def test_oversample_banked_matches_executor(rng, up):
    """output_oversample chains (afsk.py:164-165) through the banked
    runtime: BlockPlan models the demod-rate change (up/trim_post), the
    in-block zero-stuff + valid resample reproduces scipy's padded
    resample_poly in the interior, and packets match the sequential
    executor at exact demod-rate stream addresses -- across multiple
    blocks, the grouped dispatch, and the device codec.  up=3 exercises
    the tail-trim arithmetic with trim_post % up != 0."""
    from pymodem_tpu.config import (
        AFSKModemSpec,
        BinarySlicerSpec,
        ChainSpec,
        IL2PCodecSpec,
        LFSRStreamSpec,
    )
    from pymodem_tpu.runtime.bank import run_banked
    from pymodem_tpu.runtime.executor import run_chain
    from pymodem_tpu.synth import fixtures as fx
    from pymodem_tpu.synth import modulate as mod

    rate = 8000.0
    sent = fx.payloads(rng, count=6, size=30)
    line = fx.il2p_line_bits(sent, polynomial=0x3, invert=False,
                             gap_bits=4000)
    audio = mod.afsk_modulate(line, rate, 1200.0, 1200.0, 2200.0)
    modem = AFSKModemSpec(sample_rate=rate, output_oversample=float(up))
    chain = ChainSpec(
        name=f"afsk-ovs{up}",
        modem=modem,
        slicer=BinarySlicerSpec(sample_rate=rate * up, symbol_rate=1200.0,
                                lock_rate=0.75),
        stream=LFSRStreamSpec(polynomial=0x3, invert=False),
        codec=IL2PCodecSpec(ident=f"ovs{up}"),
    )
    seq = [(p.streamaddress, bytes(p.data)) for p in run_chain(chain, audio)]
    assert len(seq) >= 6
    for codec, group in (("host", None), ("device", None), ("device", 2)):
        banked = run_banked([chain], audio, codec=codec, block_seconds=2.0,
                            overlap_seconds=1.5, max_blocks_per_step=group)
        got = [
            (p.streamaddress, bytes(p.data)) for p in banked[chain.name]
        ]
        assert got == seq, (codec, group)


def test_device_codec_budget_escalation(rng):
    """Packet-dense traffic that saturates max_packets_per_block escalates
    ON DEVICE (packet slots double, codec re-runs) instead of host-FSM
    decoding the saturated blocks -- packets identical to a run whose
    initial budget was already big enough, and the learned budget lands
    in the cache so the repeat call needs no escalation."""
    from pymodem_tpu import profiling
    from pymodem_tpu.config import (
        AFSKModemSpec,
        BinarySlicerSpec,
        ChainSpec,
        IL2PCodecSpec,
        LFSRStreamSpec,
    )
    from pymodem_tpu.runtime import bank as B
    from pymodem_tpu.runtime.bank import run_banked
    from pymodem_tpu.synth import fixtures as fx
    from pymodem_tpu.synth import modulate as mod

    rate = 8000.0
    sent = fx.payloads(rng, count=12, size=24)
    line = fx.il2p_line_bits(sent, polynomial=0x3, invert=False,
                             gap_bits=200)  # ~6 frames per 3.5 s window
    audio = mod.afsk_modulate(line, rate, 1200.0, 1200.0, 2200.0)
    chain = ChainSpec(
        name="dense",
        modem=AFSKModemSpec(sample_rate=rate),
        slicer=BinarySlicerSpec(sample_rate=rate, symbol_rate=1200.0,
                                lock_rate=0.75),
        stream=LFSRStreamSpec(polynomial=0x3, invert=False),
        codec=IL2PCodecSpec(ident="dense"),
    )
    kw = dict(codec="device", block_seconds=2.0, overlap_seconds=1.5)
    roomy = run_banked([chain], audio, max_packets_per_block=16, **kw)

    def pkts(res):
        return [(p.streamaddress, bytes(p.data)) for p in res[chain.name]]

    # auto sizing: the sizing readback right-sizes the packet-slot budget
    # from the busiest block's candidate count (_auto_max_packets), so a
    # deliberately tight default needs ZERO escalation re-runs
    B._CODEC_BUDGET_CACHE.clear()
    profiling.reset()
    profiling.enable(True)
    try:
        tight = run_banked([chain], audio, max_packets_per_block=2, **kw)
        c1 = profiling.counts()
    finally:
        profiling.enable(False)
    assert c1.get("device_codec_escalate", 0) == 0, c1
    assert pkts(tight) == pkts(roomy)

    # safety net: with an EXPLICIT candidate budget the sizing readback is
    # skipped, so the tight budget saturates and the device-side escalation
    # ladder (packet slots double, codec re-runs) must recover exactly
    B._CODEC_BUDGET_CACHE.clear()
    profiling.reset()
    profiling.enable(True)
    try:
        forced = run_banked([chain], audio, max_packets_per_block=2,
                            total_candidates=64, **kw)
        c2 = profiling.counts()
    finally:
        profiling.enable(False)
    assert c2.get("device_codec_escalate", 0) >= 1, c2
    assert pkts(forced) == pkts(roomy)
    assert len(pkts(roomy)) >= 12


def test_oversample_through_pipelined_runner(rng):
    """output_oversample chains flow through run_banked_many (the serving
    pipeline previously refused them) with per-recording results equal to
    run_banked; StreamDecoder still refuses them with a clear error."""
    from pymodem_tpu.config import (
        AFSKModemSpec,
        BinarySlicerSpec,
        ChainSpec,
        IL2PCodecSpec,
        LFSRStreamSpec,
    )
    from pymodem_tpu.runtime.bank import run_banked, run_banked_many
    from pymodem_tpu.runtime.stream import StreamDecoder
    from pymodem_tpu.synth import fixtures as fx
    from pymodem_tpu.synth import modulate as mod

    rate = 8000.0
    sent = fx.payloads(rng, count=4, size=24)
    line = fx.il2p_line_bits(sent, polynomial=0x3, invert=False,
                             gap_bits=3000)
    audio = mod.afsk_modulate(line, rate, 1200.0, 1200.0, 2200.0)
    chain = ChainSpec(
        name="ovs-pipe",
        modem=AFSKModemSpec(sample_rate=rate, output_oversample=2.0),
        slicer=BinarySlicerSpec(sample_rate=2 * rate, symbol_rate=1200.0,
                                lock_rate=0.75),
        stream=LFSRStreamSpec(polynomial=0x3, invert=False),
        codec=IL2PCodecSpec(ident="ovs-pipe"),
    )
    kw = dict(block_seconds=2.0, overlap_seconds=1.5)
    solo = run_banked([chain], audio, **kw)
    piped = run_banked_many([chain], [audio, audio], depth=1, **kw)
    want = [(p.streamaddress, bytes(p.data)) for p in solo[chain.name]]
    assert want and all(
        [(p.streamaddress, bytes(p.data)) for p in rec[chain.name]] == want
        for rec in piped
    )
    # streaming decodes oversample chains too now (input-rate feed carry,
    # demod-unit block plan): chunked feeds == the one-shot banked decode
    dec = StreamDecoder([chain], rate, **kw, blocks_per_step=2)
    chunk = int(1.3 * rate)
    for s in range(0, len(audio), chunk):
        dec.feed(audio[s : s + chunk])
    dec.flush()
    got = [
        (p.streamaddress, bytes(p.data))
        for p in dec.packets()[chain.name]
    ]
    assert got == want


def test_lfsr_settings_do_not_fragment_banks(rng):
    """Descrambler (poly, invert) is per-chain DATA, not a grouping key
    (ops/lfsr.descramble_bytes_multi): the fixture PLL config's invert
    pair runs as ONE 2-chain bank, and a bank freely mixing polynomials
    0x3 / 0x63003 / invert decodes every chain identically to running it
    alone (the reference's process pool mixes any LFSR settings,
    pymodem.py:140-166, lfsr.py:22-51)."""
    import jax.numpy as jnp

    from dataclasses import replace

    from pymodem_tpu.config import (
        AFSKModemSpec,
        BinarySlicerSpec,
        ChainSpec,
        IL2PCodecSpec,
        LFSRStreamSpec,
        load_plan,
    )
    from pymodem_tpu.runtime.bank import group_chains, run_banked
    from pymodem_tpu.synth import fixtures as fx
    from pymodem_tpu.synth import modulate as mod

    # the flagship fixture config: two chains identical except invert
    plan = load_plan(os.path.join(CONFIG_DIR, "afsk_300_pll.json"), 8000)
    banks = group_chains(plan.chains, jnp.float64)
    assert len(banks) == 1 and len(banks[0].specs) == 2
    assert banks[0].stream_inverts == (False, True)

    # a 3-chain bank mixing polynomial AND invert: each chain's segment is
    # encoded with that chain's own LFSR settings, all share one audio
    rate = 8000.0
    settings = [(0x3, False), (0x63003, False), (0x3, True)]
    segments = []
    for i, (poly, inv) in enumerate(settings):
        sent = fx.payloads(rng, count=3, size=24)
        line = fx.il2p_line_bits(sent, polynomial=poly, invert=inv,
                                 gap_bits=2000)
        segments.append(mod.afsk_modulate(line, rate, 1200.0, 1200.0, 2200.0))
    audio = np.concatenate(segments)
    base = ChainSpec(
        name="mix0",
        modem=AFSKModemSpec(sample_rate=rate),
        slicer=BinarySlicerSpec(sample_rate=rate, symbol_rate=1200.0,
                                lock_rate=0.75),
        stream=LFSRStreamSpec(polynomial=0x3, invert=False),
        codec=IL2PCodecSpec(ident="mix0"),
    )
    chains = [
        replace(base, name=f"mix{i}", codec=replace(base.codec, ident=f"mix{i}"),
                stream=LFSRStreamSpec(polynomial=poly, invert=inv))
        for i, (poly, inv) in enumerate(settings)
    ]
    assert len(group_chains(chains, jnp.float64)) == 1
    kw = dict(block_seconds=2.0, overlap_seconds=1.5)
    for codec in ("host", "device"):
        mixed = run_banked(chains, audio, codec=codec, **kw)
        for chain in chains:
            solo = run_banked([chain], audio, codec=codec, **kw)
            got = [(p.streamaddress, bytes(p.data))
                   for p in mixed[chain.name]]
            want = [(p.streamaddress, bytes(p.data))
                    for p in solo[chain.name]]
            assert got == want, (codec, chain.name)
            assert len(got) >= 3, (codec, chain.name)


def test_mixed_codec_bank_keeps_device_codec(rng):
    """A bank whose chains mix codec types/options (the reference's A/B
    pattern: an ax25 and an il2p chain sharing one demod family,
    chain_builder.py:64-68) dispatches the device codec per codec
    sub-group instead of dropping the whole bank to the host FSMs --
    zero host_codec profiling hits, packets identical to the host path."""
    import jax.numpy as jnp

    from pymodem_tpu import profiling
    from pymodem_tpu.config import (
        AFSKModemSpec,
        AX25CodecSpec,
        BinarySlicerSpec,
        ChainSpec,
        IL2PCodecSpec,
        LFSRStreamSpec,
    )
    from pymodem_tpu.runtime import bank as B
    from pymodem_tpu.runtime.bank import group_chains, run_banked
    from pymodem_tpu.synth import fixtures as fx
    from pymodem_tpu.synth import modulate as mod

    rate = 8000.0
    sent_ax = fx.payloads(rng, count=3, size=24)
    sent_il = fx.payloads(rng, count=3, size=24)
    line = fx.ax25_line_bits(sent_ax, polynomial=0x3, invert=True,
                             gap_bits=2000)
    line += fx.il2p_line_bits(sent_il, polynomial=0x3, invert=False,
                              gap_bits=2000)
    audio = mod.afsk_modulate(line, rate, 1200.0, 1200.0, 2200.0)
    modem = AFSKModemSpec(sample_rate=rate)
    slicer = BinarySlicerSpec(sample_rate=rate, symbol_rate=1200.0,
                              lock_rate=0.75)
    chains = [
        ChainSpec(name="ab-ax25", modem=modem, slicer=slicer,
                  stream=LFSRStreamSpec(polynomial=0x3, invert=True),
                  codec=AX25CodecSpec(ident="ab-ax25")),
        ChainSpec(name="ab-il2p", modem=modem, slicer=slicer,
                  stream=LFSRStreamSpec(polynomial=0x3, invert=False),
                  codec=IL2PCodecSpec(ident="ab-il2p")),
    ]
    assert len(group_chains(chains, jnp.float64)) == 1  # shared demod bank
    kw = dict(block_seconds=2.0, overlap_seconds=1.5)
    host = run_banked(chains, audio, codec="host", **kw)
    B._CODEC_BUDGET_CACHE.clear()
    profiling.reset()
    profiling.enable(True)
    try:
        dev = run_banked(chains, audio, codec="device", **kw)
        counts = profiling.counts()
    finally:
        profiling.enable(False)
    assert counts.get("host_codec", 0) == 0, counts
    assert counts.get("device_codec_step", 0) >= 2  # one per codec sub-group
    for chain in chains:
        got = [(p.streamaddress, bytes(p.data)) for p in dev[chain.name]]
        want = [(p.streamaddress, bytes(p.data)) for p in host[chain.name]]
        assert got == want, chain.name
        assert len(got) >= 3, chain.name


def test_budget_cache_merge_across_heterogeneous_workloads(rng):
    """Dispatches sharing one budget-cache key can see different traffic
    (block groups of one recording, streaming steps, same-shape
    recordings).  A store must MERGE upper bounds with the existing entry
    (bank._merge_budget_entry) instead of overwriting: before round 5's
    fix, a long-packet workload (payload-budget escalation -> 1023) and a
    short-packet one ping-ponged the shared entry, so every later run
    re-ran the redo -> escalate -> host-fallback ladder (a 0.29 s TPU
    PLL hour measured 13 s/run)."""
    from pymodem_tpu import profiling
    from pymodem_tpu.config import (
        AFSKModemSpec,
        BinarySlicerSpec,
        ChainSpec,
        IL2PCodecSpec,
        LFSRStreamSpec,
    )
    from pymodem_tpu.runtime import bank as B
    from pymodem_tpu.synth import fixtures as fx
    from pymodem_tpu.synth import modulate as mod

    rate = 8000.0
    chain = ChainSpec(
        name="m",
        modem=AFSKModemSpec(sample_rate=rate),
        slicer=BinarySlicerSpec(sample_rate=rate, symbol_rate=1200.0,
                                lock_rate=0.75),
        stream=LFSRStreamSpec(polynomial=0x3, invert=False),
        codec=IL2PCodecSpec(ident="m"),
    )

    def rec(size):
        line = fx.il2p_line_bits(fx.payloads(rng, count=2, size=size),
                                 polynomial=0x3, invert=False,
                                 gap_bits=40000)
        a = np.asarray(mod.afsk_modulate(line, rate, 1200.0, 1200.0, 2200.0),
                       np.float32)
        return a

    long_rec, short_rec = rec(300), rec(40)
    n = max(len(long_rec), len(short_rec))
    long_rec = np.pad(long_rec, (0, n - len(long_rec)))
    short_rec = np.pad(short_rec, (0, n - len(short_rec)))
    kw = dict(codec="device", dtype=np.float32, block_seconds=8.0,
              overlap_seconds=1.5)

    B._CODEC_BUDGET_CACHE.clear()
    first_long = B.run_banked([chain], long_rec, **kw)   # escalates pay
    first_short = B.run_banked([chain], short_rec, **kw)  # same cache key
    assert len(B._CODEC_BUDGET_CACHE) == 1
    entry = next(iter(B._CODEC_BUDGET_CACHE.values()))
    assert entry[6] == 1023, entry  # merged entry keeps the escalated pay

    profiling.reset()
    profiling.enable(True)
    try:
        again_long = B.run_banked([chain], long_rec, **kw)
        again_short = B.run_banked([chain], short_rec, **kw)
    finally:
        profiling.enable(False)
    counts = profiling.counts()
    assert counts.get("device_codec_escalate", 0) == 0, counts
    assert counts.get("device_codec_redo", 0) == 0, counts
    assert counts.get("packet_fallback", 0) <= 2, counts  # no host decodes

    def pk(res):
        return {k: [(p.streamaddress, bytes(p.data)) for p in v]
                for k, v in res.items()}

    assert pk(again_long) == pk(first_long)
    assert pk(again_short) == pk(first_short)
    assert sum(len(v) for v in first_long.values()) >= 1
    assert sum(len(v) for v in first_short.values()) >= 1


def test_grouped_pipelined_matches_grouped_host(fixture_audio):
    """Grouped banks on the device-codec route dispatch per block group
    (bank._submit_bank_group_pipelined) so readbacks overlap later
    groups' compute; packets must equal the grouped host-FSM route
    (identical per-group demod programs, exact codec)."""
    from dataclasses import replace

    from pymodem_tpu.runtime.bank import run_banked

    path = os.path.join(CONFIG_DIR, "afsk_300.json")
    if not os.path.exists(path):
        pytest.skip("reference configs not available")
    rate, audio = fixture_audio
    plan = load_plan(path, rate)
    base = [c for c in plan.chains
            if c.name == "AFSK 300 Il2Pc PLL inverted"][0]
    chains = [replace(base, name=f"p{i}",
                      modem=replace(base.modem, carrier_freq=1698.0 + i))
              for i in range(2)]
    audio = np.tile(audio, 2)  # ~313 s -> several 4-block groups
    kw = dict(dtype=np.float32, block_seconds=20.0, overlap_seconds=4.0,
              max_packet_seconds=3.0, max_blocks_per_step=4)
    host = run_banked(chains, audio, codec="host", **kw)
    dev = run_banked(chains, audio, codec="device", **kw)
    dev2 = run_banked(chains, audio, codec="device", **kw)  # cache warm
    total = 0
    for c in chains:
        a = [(p.streamaddress, bytes(p.data)) for p in host[c.name]]
        b = [(p.streamaddress, bytes(p.data)) for p in dev[c.name]]
        b2 = [(p.streamaddress, bytes(p.data)) for p in dev2[c.name]]
        assert a == b == b2, (c.name, len(a), len(b))
        total += len(a)
    assert total > 100
