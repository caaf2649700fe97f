"""TPU verification of the Pallas loop engine: bitwise parity + speed.

1. loop_lanes_pallas vs the vmapped lax.scan loop on random lanes --
   expected bitwise identical on TPU (same primitives, same order,
   Mosaic sin == XLA sin).
2. Fixture decode through run_banked with engine=pallas vs engine=scan --
   identical packets.
3. Throughput of the kernel vs the scan at bench shapes.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from pymodem_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

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

    # --- 1. bitwise parity, small shapes
    C, B, T = 1, 6, 3000
    x = rng.standard_normal((C * B, T)).astype(np.float32)
    want = np.asarray(jax.jit(jax.vmap(
        lambda row: afsk_pll(row, lp, unroll=8)
    ))(jnp.asarray(x)))
    lane_params = lane_params_from_loop(
        LoopParams(*[jnp.asarray(np.asarray(v)[None]) for v in lp]), C, B
    )
    got = np.asarray(loop_lanes_pallas(jnp.asarray(x), lane_params,
                                       "afsk_pll", tc=512))
    exact = float(np.mean(got == want))
    print(f"bitwise-equal fraction: {exact:.6f} "
          f"max|diff|={float(np.max(np.abs(got - want))):.3g}", flush=True)

    # --- 2. fixture decode parity scan vs pallas
    from scipy.io import wavfile

    from pymodem_tpu.config import load_plan
    from pymodem_tpu.runtime.bank import run_banked

    rate, audio = wavfile.read(
        "/root/reference/audio_samples/afsk_300_il2pc_noise.wav"
    )
    plan = load_plan("/root/reference/configs/afsk_300_pll.json", rate)
    chains = plan.chains
    os.environ["PYMODEM_TPU_LOOP_ENGINE"] = "scan"
    scan_out = run_banked(chains, audio, dtype=jnp.float32)
    os.environ["PYMODEM_TPU_LOOP_ENGINE"] = "pallas"
    pallas_out = run_banked(chains, audio, dtype=jnp.float32)
    os.environ["PYMODEM_TPU_LOOP_ENGINE"] = "auto"
    same = True
    for name in scan_out:
        a = [(p.streamaddress, list(p.data)) for p in scan_out[name]]
        b = [(p.streamaddress, list(p.data)) for p in pallas_out[name]]
        n_scan, n_pallas = len(a), len(b)
        eq = a == b
        same = same and eq
        print(f"{name}: scan={n_scan} pallas={n_pallas} equal={eq}",
              flush=True)
    print(f"decode parity: {same}", flush=True)

    # --- 3. throughput at bench shapes
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

    for lanes, T2 in ((2560, 88000), (10240, 22000)):
        xb = rng.standard_normal((lanes, T2)).astype(np.float32)
        lane_p = lane_params_from_loop(
            LoopParams(*[jnp.asarray(np.asarray(v)[None]) for v in lp]),
            1, lanes,
        )
        xd = jnp.asarray(xb)

        t_scan = timeit(
            jax.jit(jax.vmap(lambda row: afsk_pll(row, lp, unroll=8))), xd
        )
        t_pal = timeit(
            lambda a: loop_lanes_pallas(a, lane_p, "afsk_pll", tc=512), xd
        )
        tot = lanes * T2 / 1e9
        print(f"lanes={lanes} T={T2}: scan {tot/t_scan:6.2f}G "
              f"pallas {tot/t_pal:6.2f}G lane-samples/s "
              f"({t_scan*1e3:.1f}ms vs {t_pal*1e3:.1f}ms)", flush=True)


if __name__ == "__main__":
    main()
