"""Stage breakdown of the coherent (AFSK-PLL) bank on the bench workload."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    from pymodem_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    from dataclasses import replace

    from scipy.io import wavfile

    from pymodem_tpu import profiling
    from pymodem_tpu.config import load_plan
    from pymodem_tpu.runtime.bank import run_banked

    rate, audio = wavfile.read(
        "/root/reference/audio_samples/afsk_300_il2pc_noise.wav"
    )
    plan = load_plan("/root/reference/configs/afsk_300.json", rate)
    base = [
        c for c in plan.chains if c.name == "AFSK 300 Il2Pc PLL inverted"
    ][0]
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    blocks_per_step = sys.argv[2] if len(sys.argv) > 2 else "auto"
    if blocks_per_step not in ("auto", "none"):
        blocks_per_step = int(blocks_per_step)
    elif blocks_per_step == "none":
        blocks_per_step = None
    codec = sys.argv[3] if len(sys.argv) > 3 else "device"
    chains = [
        replace(base, name=f"pll{i}",
                modem=replace(base.modem, carrier_freq=1696.0 + i))
        for i in range(n_chains)
    ]
    hour = 3600 * rate
    tiled = np.tile(audio, -(-hour // len(audio)))[:hour]
    # steady-state decode, like bench.py: the one-time 57.6 MB host->device
    # upload (~1.6 s over the tunnel) would otherwise ride on the first
    # readback's stage line
    import jax

    tiled = jax.device_put(tiled)

    kw = dict(codec=codec, max_blocks_per_step=blocks_per_step)
    pkts = run_banked(chains, tiled, **kw)  # warm
    n = sum(len(v) for v in pkts.values())
    profiling.enable(True)
    t0 = time.time()
    run_banked(chains, tiled, **kw)
    wall = time.time() - t0
    msps = n_chains * len(tiled) / wall / 1e6
    print(f"chains={n_chains} blocks/step={blocks_per_step} codec={codec}: "
          f"{wall:.2f}s = {msps:.1f} Msps, {n} pkts")
    print(profiling.report())


if __name__ == "__main__":
    main()
