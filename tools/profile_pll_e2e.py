#!/usr/bin/env python
"""End-to-end PLL run_banked profile: where the non-demod time goes.

profile_stages.py times the device compute pipeline stage by stage; this
tool times the FULL run_banked call (the bench's coherent_pll_msps
workload) and prints the profiling stage table plus a wall breakdown, so
the gap between pipeline compute and the benched number is attributed
(codec device step, packed transfer, host packet build, dispatch).

    python tools/profile_pll_e2e.py [seconds] [n_chains]
"""

import sys
import time
from dataclasses import replace

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> int:
    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 3600
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pymodem_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    from scipy.io import wavfile

    from pymodem_tpu import profiling
    from pymodem_tpu.config import load_plan
    from pymodem_tpu.runtime.bank import run_banked

    rate, audio = wavfile.read(
        "/root/reference/audio_samples/afsk_300_il2pc_noise.wav"
    )
    plan = load_plan("/root/reference/configs/afsk_300.json", rate)
    base = [c for c in plan.chains
            if c.name == "AFSK 300 Il2Pc PLL inverted"][0]
    chains = [replace(base, name=f"pll{i}",
                      modem=replace(base.modem, carrier_freq=1696.0 + i))
              for i in range(n_chains)]
    n = seconds * rate
    tiled = jax.device_put(np.tile(audio, -(-n // len(audio)))[:n])
    kw = dict(codec="device", max_packet_seconds=3.0)

    # warm: compiles + budget cache
    pk = run_banked(chains, tiled, **kw)
    run_banked(chains, tiled, **kw)
    npk = sum(len(v) for v in pk.values())

    profiling.enable(True)
    profiling.reset()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        run_banked(chains, tiled, **kw)
        best = min(best, time.perf_counter() - t0)
    msps = n_chains * n / best / 1e6
    print(f"chains={n_chains} seconds={seconds} packets={npk} "
          f"best={best*1e3:.1f}ms msps={msps:.1f}")
    print(profiling.report())

    # decompose the dominant collect sync: device compute (scalar-sum
    # readback of the packed buffer) vs the full packed transfer
    import jax.numpy as jnp

    from pymodem_tpu.runtime.bank import (
        _CODEC_BUDGET_CACHE,
        _submit_banked,
    )

    done = _submit_banked(chains, tiled, jnp.float32, "auto", "auto",
                          "auto", 8, "device", 8, "auto", None, 3.0)
    for c in done:
        c()
    import pymodem_tpu.runtime.bank as B

    orig = B.compact_codec_out
    packed_holder = {}

    def spy(*a, **k):
        packed_holder["packed"] = out = orig(*a, **k)
        return out

    # demod-only: the bank device step synced on a scalar (no codec)
    from pymodem_tpu.runtime.bank import (
        _dispatch_bank_step,
        _slicer_static,
        bank_capacity,
        group_chains,
        plan_bank_run,
    )

    bk = group_chains(chains, jnp.float32)[0]
    plan2, group2 = plan_bank_run(bk, len(tiled), rate, jnp.float32,
                                  "auto", "auto", 3.0, "auto")
    st2 = _slicer_static(bk)
    cap2 = bank_capacity(bk, plan2)
    best3 = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        arrays = _dispatch_bank_step(bk, plan2, st2, cap2, 0, tiled,
                                     jnp.float32, "auto", 8, group2)
        float(np.asarray(jnp.sum(arrays[2].astype(jnp.int32))))
        best3 = min(best3, time.perf_counter() - t0)
    print(f"demod-only(scalar sync)  {best3*1e3:7.1f}ms  "
          f"lanes={len(bk.specs)*(group2 or plan2.n_blocks)}")

    B.compact_codec_out = spy
    try:
        for label in ("compute(scalar sync)", "compute+transfer"):
            best2 = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                colls = _submit_banked(chains, tiled, jnp.float32, "auto",
                                       "auto", "auto", 8, "device", 8,
                                       "auto", None, 3.0)
                if label == "compute(scalar sync)":
                    p = packed_holder["packed"]
                    float(np.asarray(jnp.sum(p[:64].astype(jnp.int32))))
                else:
                    for c in colls:
                        c()
                best2 = min(best2, time.perf_counter() - t0)
            p = packed_holder["packed"]
            print(f"{label:<22} {best2*1e3:7.1f}ms  "
                  f"(packed {p.nbytes/1e6:.2f} MB)")
    finally:
        B.compact_codec_out = orig
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
