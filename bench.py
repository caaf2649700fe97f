#!/usr/bin/env python
"""Benchmark: end-to-end demod-chain throughput on one TPU chip.

Workload: a 64-chain AFSK-300 space-gain sweep bank (the reference's
sweep-bank pattern, configs/afsk_1200_ax25_super_opt.json) decoding ONE
HOUR of audio (the bundled fixture WAV tiled) -- full pipeline: FIR
band-pass, quadrature tone correlators, FIR low-pass, symbol-timing
slicer, LFSR descrambler and IL2P syncword scan on device in fixed-shape
40-block groups (HBM-bounded regardless of recording length); IL2P RS/CRC
framing on host from device-computed sync candidates.

Metric: aggregate chain-Msamples/s/chip, steady state (the persistent
compilation cache makes compile a one-time cost; the driver's first run on
a cold cache pays it once).  Codec stage: device syncword scan + host FSM
from candidates (the fully-on-device codec path exists behind
run_banked(codec='device'); its candidate compaction is not yet tuned, so
the hybrid is the faster end-to-end config).  Baseline: the reference's measured aggregate
on its own 5-chain config, 0.33 Msamples/s on 1 vCPU (BASELINE.md) -- its
best measured aggregate, per-process-parallel.

Prints ONE JSON line.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

N_CHAINS = 64
HOUR_SECONDS = 3600
BASELINE_AGG_MSPS = 0.33  # reference aggregate Msamples/s (BASELINE.md)
EXPECTED_PACKETS = 1080  # sweep over 1h: only near-unity-gain chains decode the noisy fixture


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
    reps = -(-HOUR_SECONDS * rate // len(audio))
    tiled = np.tile(audio, reps)[: HOUR_SECONDS * rate]

    # Warmup: compile (or load from the persistent cache).
    packets = run_banked(chains, tiled, codec="host", max_blocks_per_step=40)
    n_packets = sum(len(v) for v in packets.values())

    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        run_banked(chains, tiled, codec="host", max_blocks_per_step=40)
        best = min(best, time.time() - t0)

    chain_samples = N_CHAINS * len(tiled)
    msps = chain_samples / best / 1e6
    result = {
        "metric": "aggregate demod chain-Msamples/s/chip (end-to-end decode)",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / BASELINE_AGG_MSPS, 1),
        "chains": N_CHAINS,
        "audio_seconds": len(tiled) / rate,
        "wall_seconds": round(best, 2),
        "packets": n_packets,
        "packets_expected": EXPECTED_PACKETS,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
