"""Sweep the Pallas loop kernel's (rt, tc) tile shape against the scan."""

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
    from pymodem_tpu.config import AFSKPLLModemSpec
    from pymodem_tpu.dsp.loops import LoopParams, afsk_pll
    from pymodem_tpu.dsp.pallas_loops import (
        lane_params_from_loop,
        loop_lanes_pallas,
    )

    spec = AFSKPLLModemSpec(sample_rate=8000.0, carrier_freq=1700.0)
    lp64 = modems._loop_params_host(spec)
    lp = LoopParams(**{
        k: (np.asarray(v, np.float32)
            if np.asarray(v).dtype.kind == "f" else np.asarray(v))
        for k, v in lp64._asdict().items()
    })
    rng = np.random.default_rng(0)

    def timeit(fn, *args, reps=3):
        out = fn(*args)
        _ = float(np.asarray(jnp.sum(out)))
        best = float("inf")
        for _i in range(reps):
            t0 = time.time()
            out = fn(*args)
            _ = float(np.asarray(jnp.sum(out)))
            best = min(best, time.time() - t0)
        return best

    for lanes, T in ((2560, 88000), (10240, 22000)):
        xb = rng.standard_normal((lanes, T)).astype(np.float32)
        lane_p = lane_params_from_loop(
            LoopParams(*[jnp.asarray(np.asarray(v)[None]) for v in lp]),
            1, lanes,
        )
        xd = jnp.asarray(xb)
        tot = lanes * T / 1e9
        t_scan = timeit(
            jax.jit(jax.vmap(lambda row: afsk_pll(row, lp, unroll=8))), xd
        )
        print(f"lanes={lanes}: scan {tot/t_scan:6.2f}G ({t_scan*1e3:.1f}ms)",
              flush=True)
        for rt, tc, groups in (
            (8, 512, 1), (16, 256, 1), (16, 256, 2), (32, 128, 1),
            (32, 128, 4), (32, 256, 2), (64, 64, 1), (64, 64, 4),
            (64, 64, 8), (64, 96, 2),
        ):
            try:
                t_pal = timeit(
                    lambda a: loop_lanes_pallas(a, lane_p, "afsk_pll",
                                                tc=tc, rt=rt, groups=groups),
                    xd,
                )
                print(f"  rt={rt:3d} tc={tc:4d} g={groups}: "
                      f"{tot/t_pal:6.2f}G ({t_pal*1e3:.1f}ms)", flush=True)
            except Exception as exc:
                print(f"  rt={rt:3d} tc={tc:4d} g={groups}: FAIL "
                      f"{str(exc)[:120]}", flush=True)


if __name__ == "__main__":
    main()
