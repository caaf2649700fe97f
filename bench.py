#!/usr/bin/env python
"""Benchmark: end-to-end demod-chain throughput on one TPU chip.

Headline workload: a 64-chain AFSK-300 space-gain sweep bank (the
reference's sweep-bank pattern, configs/afsk_1200_ax25_super_opt.json)
decoding ONE HOUR of audio (the bundled fixture WAV tiled) -- full
pipeline: FIR band-pass, quadrature tone correlators, FIR low-pass,
symbol-timing slicer, LFSR descrambler, IL2P decode.  Block/group
geometry is the runtime's (plan_bank_run: lane-tile-aligned,
HBM-bounded regardless of recording length), and a pure space_gain
sweep demods as ONE chain's convolutions plus per-chain scalar
combines (bank._afsk_bank_demod_shared).

Also measured (reported as extra keys on the same JSON line):
* the same workload with the fully-on-device codec
  (run_banked(codec='device'): batched RS/CRC on the MXU, host only
  builds packet objects), and
* the coherent-family bank (AFSK-PLL, the lax.scan/Pallas loop path)
  with the device codec -- the scan-bound ceiling the AFSK correlator
  number does not exercise.

Every remaining modem family is measured the same way on synthesized
on-air audio (the reference ships a fixture for AFSK only): QPSK Costas
(qpsk_2400), FSK/G3RUH (fsk_9600), and 4FSK (4fsk_9600) banks, each an
8-chain parameter sweep over 15 minutes of tiled synth audio with the
device codec -- reported as ``qpsk_msps`` / ``fsk_msps`` /
``fourlevel_msps`` with packet-count checks.  ``pll_pipelined_msps``
measures run_banked_many(depth=1) over a stream of PLL recordings (the
serving warm path): readbacks and host packet builds hide behind the
next recording's device compute.

Metric: aggregate chain-Msamples/s/chip, steady state, computed from
the MIN of N_REPS wall times (tunnel + host-load jitter is one-sided
additive on this backend, so min is the statistic that reproduces
across captures; same-day medians spanned 358-733 Msps on one family
while mins held within a few percent).  The median-based figure ships
alongside as ``*_median_msps`` with the rep spread, so both the floor
and the typical value are in the artifact.  Compile is a one-time cost
(persistent compilation cache).  Baseline: the reference's measured
aggregate on its own 5-chain config, 0.33 Msamples/s on 1 vCPU
(BASELINE.md) -- its best measured aggregate, per-process-parallel.

Prints ONE JSON line.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

N_CHAINS = 64
N_PLL_CHAINS = 8
N_PLL_WIDE_CHAINS = 32
N_FAMILY_CHAINS = 8
HOUR_SECONDS = int(os.environ.get("PYMODEM_TPU_BENCH_SECONDS", 3600))
FAMILY_SECONDS = int(os.environ.get("PYMODEM_TPU_BENCH_FAMILY_SECONDS", 900))
# traffic contract for the fixture WAV: IL2P frames arrive ~3.1 s apart and
# each lasts well under 3 s of wire time at 300 bps -- the runtime derives
# the block/overlap geometry from this bound (bank_auto_geometry); without
# it the auto default protects the PROTOCOL-max packet (~30 s at 300 bps)
FIXTURE_MAX_PACKET_SECONDS = 3.0
PIPELINE_DEPTH_RECORDINGS = 3
N_REPS = 5
BASELINE_AGG_MSPS = 0.33  # reference aggregate Msamples/s (BASELINE.md)
EXPECTED_PACKETS = 1080  # sweep over 1h: only near-unity-gain chains decode


def _measure(fn, reps=N_REPS):
    """(min, median, spread) of wall times; two warm calls discarded (a
    fresh process pays one-time executable loads over the tunnel that
    bleed into the first dispatches).  Tunnel/host-load jitter only ever
    ADDS time, so the min is the reproducible statistic and the primary
    reported number; the median rides along for context."""
    fn()
    fn()
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    med = statistics.median(times)
    spread = (max(times) - min(times)) / med if med else 0.0
    return min(times), med, spread


def main() -> int:
    from pymodem_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np
    from dataclasses import replace
    from scipy.io import wavfile

    from pymodem_tpu.config import load_plan
    from pymodem_tpu.runtime.bank import run_banked

    rate, audio = wavfile.read(
        "/root/reference/audio_samples/afsk_300_il2pc_noise.wav"
    )
    plan = load_plan("/root/reference/configs/afsk_300.json", rate)
    base = [c for c in plan.chains if c.name == "AFSK 300 Il2Pc Correlator"][0]
    chains = [
        replace(
            base, name=f"s{i}",
            modem=replace(base.modem, space_gain=0.7 + 0.005 * i),
        )
        for i in range(N_CHAINS)
    ]
    pll_base = [
        c for c in plan.chains if c.name == "AFSK 300 Il2Pc PLL inverted"
    ][0]
    pll_chains = [
        replace(pll_base, name=f"pll{i}",
                modem=replace(pll_base.modem, carrier_freq=1696.0 + i))
        for i in range(N_PLL_CHAINS)
    ]
    reps = -(-HOUR_SECONDS * rate // len(audio))
    tiled = np.tile(audio, reps)[: HOUR_SECONDS * rate]
    chain_samples = N_CHAINS * len(tiled)
    # steady state measures decode, not the one-time 57.6 MB host->device
    # upload (run_banked keeps device-resident audio as-is; a serving loop
    # or StreamDecoder holds audio on device the same way)
    import jax

    tiled = jax.device_put(tiled)

    # secondary: host-FSM codec on device-computed sync candidates
    kw300 = dict(max_packet_seconds=FIXTURE_MAX_PACKET_SECONDS)
    packets = run_banked(chains, tiled, codec="host", **kw300)
    n_packets = sum(len(v) for v in packets.values())
    best, med, _ = _measure(
        lambda: run_banked(chains, tiled, codec="host", **kw300), reps=5
    )
    msps = chain_samples / best / 1e6
    msps_med = chain_samples / med / 1e6

    # fully-on-device codec, same workload (the headline path)
    dev_packets = run_banked(chains, tiled, codec="device", **kw300)
    n_dev_packets = sum(len(v) for v in dev_packets.values())
    best_dev, med_dev, spread = _measure(
        lambda: run_banked(chains, tiled, codec="device", **kw300)
    )
    msps_dev = chain_samples / best_dev / 1e6
    msps_dev_med = chain_samples / med_dev / 1e6

    # coherent family: AFSK-PLL bank (scan/Pallas loop path), device codec
    pll_samples = N_PLL_CHAINS * len(tiled)
    pll_packets = run_banked(pll_chains, tiled, codec="device", **kw300)
    n_pll = sum(len(v) for v in pll_packets.values())
    best_pll, med_pll, _ = _measure(
        lambda: run_banked(pll_chains, tiled, codec="device", **kw300),
        reps=5,
    )
    msps_pll = pll_samples / best_pll / 1e6
    msps_pll_med = pll_samples / med_pll / 1e6

    # wide coherent bank: 4x the chains -- measures whether the coherent
    # pipeline is lane-starved or throughput-saturated.  (Observed: ~630
    # Msamples/s aggregate at BOTH 8 and 32 chains, i.e. the pipeline is
    # saturated; scaling is linear-in-work at constant efficiency.)
    wide_chains = [
        replace(pll_base, name=f"pw{i}",
                modem=replace(pll_base.modem, carrier_freq=1684.0 + i))
        for i in range(N_PLL_WIDE_CHAINS)
    ]
    wide_samples = N_PLL_WIDE_CHAINS * len(tiled)
    n_wide = sum(
        len(v)
        for v in run_banked(wide_chains, tiled, codec="device",
                            **kw300).values()
    )
    best_wide, med_wide, _ = _measure(
        lambda: run_banked(wide_chains, tiled, codec="device", **kw300),
        reps=5,
    )
    msps_wide = wide_samples / best_wide / 1e6
    msps_wide_med = wide_samples / med_wide / 1e6

    # serving warm path: a stream of PLL recordings through
    # run_banked_many(depth=1) -- recording i+1's device programs dispatch
    # before recording i's packed readback, so the ~31 ms tunnel round trip
    # and the host packet build hide behind device compute
    from pymodem_tpu.runtime.bank import run_banked_many

    stream = [tiled] * PIPELINE_DEPTH_RECORDINGS
    n_pipe = sum(
        len(v)
        for rec in run_banked_many(pll_chains, stream, depth=1, **kw300)
        for v in rec.values()
    )
    best_pipe, med_pipe, _ = _measure(
        lambda: run_banked_many(pll_chains, stream, depth=1, **kw300),
        reps=5,
    )
    msps_pipe = len(stream) * pll_samples / best_pipe / 1e6
    msps_pipe_med = len(stream) * pll_samples / med_pipe / 1e6

    # streaming decode: the same 64-chain AFSK bank fed in 2-minute chunks
    # through StreamDecoder (device codec + budget cache; one packed
    # readback per step group in steady state) -- the bounded-memory path
    # a live receiver would run
    from pymodem_tpu.runtime.stream import StreamDecoder

    audio_np = np.tile(audio, reps)[: HOUR_SECONDS * rate]
    chunk = 120 * rate

    def stream_hour():
        dec = StreamDecoder(chains, rate, blocks_per_step=16, **kw300)
        n = 0
        for s in range(0, len(audio_np), chunk):
            n += len(dec.feed(audio_np[s : s + chunk]))
        n += len(dec.flush())
        return n

    n_stream = stream_hour()
    best_stream, med_stream, _ = _measure(stream_hour, reps=5)
    msps_stream = chain_samples / best_stream / 1e6
    msps_stream_med = chain_samples / med_stream / 1e6

    # remaining modem families on synthesized on-air audio (same sweep-bank
    # pattern; the reference has no fixture WAVs for these)
    family_stats = {}
    for fam, cfg, rate_f, vary in (
        ("qpsk", "qpsk_2400.json", 44100, "carrier_freq"),  # kind 'mpsk'
        ("fsk", "fsk_9600.json", 96000, "input_lpf_cutoff"),
        ("fourlevel", "4fsk_9600.json", 48000, "input_lpf_cutoff"),
        ("bpsk", "bpsk_1200.json", 44100, "carrier_freq"),  # kind 'bpsk'
        # kind 'qpsk' (Costas + branch IIRs, psk.py:197-476): no bundled
        # config uses it (the reference's qpsk_*.json are all mpsk), so
        # build the preset chain directly -- every modem kind measures
        ("qpsk_costas", None, 44100, "carrier_freq"),
    ):
        fam_chains, fam_audio, n_sent, fam_mps = _family_workload(
            cfg, rate_f, vary, FAMILY_SECONDS
        )
        fam_audio = jax.device_put(fam_audio)
        fam_samples = len(fam_chains) * len(fam_audio)
        # geometry is the runtime's choice (bank_auto_geometry); the bench
        # only states its traffic contract -- the synthesized frames' wire
        # duration -- as max_packet_seconds
        fam_kw = dict(codec="device", max_packet_seconds=fam_mps)
        counts = run_banked(fam_chains, fam_audio, **fam_kw)
        n_fam = sum(len(v) for v in counts.values())
        # families run sub-second reps and the tunnel adds 0.3-0.4 s of
        # per-rep jitter (qpsk_costas medians spanned 358-733 Msps across
        # 3-rep captures): 7 reps costs ~3 s and stabilizes the median
        best_fam, med_fam, _ = _measure(
            lambda: run_banked(fam_chains, fam_audio, **fam_kw),
            reps=7,
        )
        family_stats[fam] = {
            "msps": round(fam_samples / best_fam / 1e6, 2),
            "median_msps": round(fam_samples / med_fam / 1e6, 2),
            "packets": n_fam,
            "packets_expected": n_sent * len(fam_chains),
        }

    headline = max(msps, msps_dev)
    result = {
        "metric": "aggregate demod chain-Msamples/s/chip (end-to-end decode)",
        "value": round(headline, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(headline / BASELINE_AGG_MSPS, 1),
        "value_median": round(max(msps_med, msps_dev_med), 2),
        "spread_pct": round(spread * 100, 1),
        "reps": N_REPS,
        "chains": N_CHAINS,
        "audio_seconds": len(tiled) / rate,
        "wall_seconds": round(best_dev, 2),
        "packets": n_packets,
        "packets_expected": EXPECTED_PACKETS,
        "host_codec_msps": round(msps, 2),
        "device_codec_msps": round(msps_dev, 2),
        "device_codec_median_msps": round(msps_dev_med, 2),
        "device_codec_packets": n_dev_packets,
        "coherent_pll_msps": round(msps_pll, 2),
        "coherent_pll_median_msps": round(msps_pll_med, 2),
        "coherent_pll_chains": N_PLL_CHAINS,
        "coherent_pll_packets": n_pll,
        "pll_pipelined_msps": round(msps_pipe, 2),
        "pll_pipelined_median_msps": round(msps_pipe_med, 2),
        "pll_pipelined_recordings": PIPELINE_DEPTH_RECORDINGS,
        "pll_pipelined_packets": n_pipe,
        "pll_wide_msps": round(msps_wide, 2),
        "pll_wide_median_msps": round(msps_wide_med, 2),
        "pll_wide_chains": N_PLL_WIDE_CHAINS,
        "pll_wide_packets": n_wide,
        "stream_msps": round(msps_stream, 2),
        "stream_median_msps": round(msps_stream_med, 2),
        "stream_packets": n_stream,
    }
    for fam, stats in family_stats.items():
        result[f"{fam}_msps"] = stats["msps"]
        result[f"{fam}_median_msps"] = stats["median_msps"]
        result[f"{fam}_packets"] = stats["packets"]
        result[f"{fam}_packets_expected"] = stats["packets_expected"]
    print(json.dumps(result))
    return 0


def _family_workload(config_name: str | None, rate: float, vary: str,
                     seconds: int):
    """An N_FAMILY_CHAINS parameter-sweep bank for one modem family plus
    ``seconds`` of tiled synthesized on-air audio (int16 wire dtype, like
    the WAV fixture).  Returns (chains, audio, frames_sent_per_chain).

    config_name=None builds the Costas-QPSK preset chain (modem kind
    'qpsk'), which no bundled config exercises."""
    import numpy as np
    from dataclasses import replace

    from pymodem_tpu.config import load_plan
    from pymodem_tpu.synth import fixtures as fx
    from pymodem_tpu.synth import modulate as mod

    rng = np.random.default_rng(7)
    if config_name is None:
        from pymodem_tpu.config import (
            ChainSpec,
            IL2PCodecSpec,
            LFSRStreamSpec,
            QuadratureSlicerSpec,
            _qpsk_preset,
        )

        spec = _qpsk_preset("2400", rate)
        base = ChainSpec(
            name="qc",
            modem=spec,
            slicer=QuadratureSlicerSpec(
                sample_rate=rate, symbol_rate=1200.0, lock_rate=0.9,
                bits_per_symbol=2, state_mask=0xF,
            ),
            stream=LFSRStreamSpec(polynomial=0x1, invert=False),
            codec=IL2PCodecSpec(ident="qc"),
        )
    else:
        plan = load_plan(f"/root/reference/configs/{config_name}", rate)
        base = plan.chains[0]
    # sweep steps small enough that every chain still decodes (carrier
    # detune well inside max_freq_offset; cutoff shifts well inside the
    # filter's transition band) -- packet counts check exactly that
    step = 0.25 if vary == "carrier_freq" else 5.0
    chains = [
        replace(base, name=f"{vary[0]}{i}",
                modem=replace(base.modem,
                              **{vary: getattr(base.modem, vary) + step * i}))
        for i in range(N_FAMILY_CHAINS)
    ]
    sent, segment = fx.synthesize_for_chain(base, rate, rng, n_frames=3,
                                            size=30, gap_bits=2000)
    segment = mod.to_int16(np.asarray(segment))
    reps = max(1, seconds * int(rate) // len(segment))
    audio = np.tile(segment, reps)
    # traffic contract: wire duration of one synthesized IL2P frame
    # (sync 3 + header 15 + payload + RS parity 16 + CRC 4 bytes) at the
    # chain's bit rate, with margin
    from pymodem_tpu.runtime.bank import _chain_bit_rate

    mps = 2.0 * (3 + 15 + 30 + 16 + 4) * 8 / _chain_bit_rate(base)
    return chains, audio, len(sent) * reps, mps


if __name__ == "__main__":
    raise SystemExit(main())
