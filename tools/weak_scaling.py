#!/usr/bin/env python
"""Weak-scaling artifact: the sharded program at n_devices in {1,2,4,8}
with CONSTANT PER-SHARD WORK on the virtual CPU mesh.

Produces the measurement docs/SCALING.md cites: per-device wall time and
measured communication volume as the time axis grows with the workload
(each added device brings its own audio segment; per-shard samples stay
fixed).  Ideal weak scaling is CONSTANT wall time; efficiency(n) =
t(1) / t(n).  Communication here is exactly (a) the AGC global-max pmax
(one scalar per chain per step group) and (b) the per-shard packed packet
gather, whose bytes are recorded by intercepting gather_to_host.

Virtual CPU devices share one host's cores, so absolute times are not
TPU numbers -- the artifact demonstrates that per-shard work, collective
count, and gather volume stay per-device-constant while the workload
scales, which is what the ICI-mesh efficiency argument rests on.

    python tools/weak_scaling.py [--md]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    from pymodem_tpu.config import (
        AFSKModemSpec,
        BinarySlicerSpec,
        ChainSpec,
        IL2PCodecSpec,
        LFSRStreamSpec,
    )
    from pymodem_tpu.runtime import sharded as sh
    from pymodem_tpu.synth import fixtures as fx
    from pymodem_tpu.synth import modulate as mod

    rate = 8000.0
    rng = np.random.default_rng(17)
    sent = fx.payloads(rng, count=6, size=40)
    line = fx.il2p_line_bits(sent, polynomial=0x3, invert=False,
                             gap_bits=4000)
    segment = np.asarray(
        mod.afsk_modulate(line, rate, 1200.0, 1200.0, 2200.0), np.float32
    )
    chains = [ChainSpec(
        name="ws",
        modem=AFSKModemSpec(sample_rate=rate),
        slicer=BinarySlicerSpec(sample_rate=rate, symbol_rate=1200.0,
                                lock_rate=0.75),
        stream=LFSRStreamSpec(polynomial=0x3, invert=False),
        codec=IL2PCodecSpec(ident="ws"),
    )]
    kw = dict(codec="device", block_seconds=float(len(segment)) / rate / 2,
              overlap_seconds=1.2)

    from dataclasses import replace

    orig_gather = sh.gather_to_host
    gathered = {"bytes": 0, "calls": 0}

    def spy(x):
        out = orig_gather(x)
        gathered["bytes"] += out.nbytes
        gathered["calls"] += 1
        return out

    sh.gather_to_host = spy
    rows = []
    try:
        for axis in ("time", "chain"):
            t1 = None
            for n in (1, 2, 4, 8):
                if axis == "time":
                    # each added device brings its own audio segment
                    audio = np.tile(segment, n)
                    run_chains = chains
                    mesh = sh.make_mesh(1, n)
                    expect = 6 * n
                else:
                    # each added device brings its own chain (sweep bank)
                    audio = segment
                    run_chains = [
                        replace(chains[0], name=f"ws{i}",
                                codec=replace(chains[0].codec,
                                              ident=f"ws{i}"))
                        for i in range(n)
                    ]
                    mesh = sh.make_mesh(n, 1)
                    expect = 6 * n
                sh._SHARDED_BUDGET_CACHE.clear()
                res = sh.run_banked_sharded(run_chains, audio, mesh, **kw)
                npk = sum(len(v) for v in res.values())
                assert npk == expect, (axis, npk, n)
                best = 1e9
                for _ in range(3):
                    gathered["bytes"] = gathered["calls"] = 0
                    t0 = time.perf_counter()
                    sh.run_banked_sharded(run_chains, audio, mesh, **kw)
                    best = min(best, time.perf_counter() - t0)
                if t1 is None:
                    t1 = best
                rows.append({
                    "axis": axis,
                    "devices": n,
                    "samples_per_shard": len(segment),
                    "packets": npk,
                    "wall_ms": best * 1e3,
                    "efficiency": t1 / best,
                    "gather_bytes_per_shard": gathered["bytes"] // n,
                    "gathers": gathered["calls"],
                })
                print(rows[-1], flush=True)
    finally:
        sh.gather_to_host = orig_gather
    if "--md" in sys.argv:
        print()
        print("| axis | devices | samples/shard | packets | wall (ms) | "
              "weak-scaling efficiency | gather B/shard |")
        print("|---|---|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['axis']} | {r['devices']} | "
                  f"{r['samples_per_shard']} | "
                  f"{r['packets']} | {r['wall_ms']:.0f} | "
                  f"{r['efficiency']:.2f} | "
                  f"{r['gather_bytes_per_shard']} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
