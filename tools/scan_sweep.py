"""Measure PLL-scan throughput vs (lanes, unroll, time) on the TPU.

Explores the coherent-family scan ceiling: is the per-step cost
latency-chain bound (more lanes -> linear gain) or loop-overhead bound
(longer unroll -> gain)?  Prints one line per config.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    from pymodem_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from pymodem_tpu import modems
    from pymodem_tpu.config import load_plan
    from pymodem_tpu.dsp.loops import afsk_pll

    rate = 8000
    plan = load_plan("/root/reference/configs/afsk_300_pll.json", rate)
    spec = plan.chains[0].modem
    lp64 = modems._loop_params_host(spec)
    lp = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32)
        if np.asarray(a).dtype.kind == "f" else np.asarray(a), lp64._asdict())
    from pymodem_tpu.dsp.loops import LoopParams

    lp = LoopParams(**lp)

    def bench(lanes, T, unroll, reps=3):
        x = np.random.default_rng(0).standard_normal((lanes, T)).astype(np.float32)

        @jax.jit
        def run(xv):
            return jax.vmap(lambda row: afsk_pll(row, lp, unroll=unroll))(xv)

        xd = jnp.asarray(x)
        out = run(xd)
        _ = float(np.asarray(jnp.sum(out)))  # force
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = run(xd)
            _ = float(np.asarray(jnp.sum(out)))
            best = min(best, time.time() - t0)
        rate_g = lanes * T / best / 1e9
        print(f"lanes={lanes:6d} T={T:7d} unroll={unroll:3d} "
              f"time={best*1e3:8.2f}ms rate={rate_g:7.3f}G lane-samp/s "
              f"per-step={best/T*1e9:8.1f}ns", flush=True)

    total = 225_000_000  # ~bench scale
    for lanes in (1280, 5120, 20480):
        T = total // lanes
        for unroll in (8, 32):
            bench(lanes, T, unroll)
    # fixed T, scaling lanes only
    for lanes in (1280, 2560, 5120, 10240, 20480, 40960):
        bench(lanes, 44032, 8)


if __name__ == "__main__":
    main()
