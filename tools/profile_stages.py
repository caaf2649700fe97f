#!/usr/bin/env python
"""Stage-by-stage timing of the grouped bank device program on TPU.

Times cumulative prefixes of the real pipeline at bench-hour shapes --
framing -> input FIR -> (correlators | Pallas AGC+loop kernel) -> output
FIR -> Pallas slicer -> compaction -> descramble+sync -- so each stage's
marginal cost is the difference between adjacent lines.  Mirrors
runtime/bank.py _bank_frames_compute's Pallas branch stage for stage
(drift check: packet parity is asserted by the test suite, this tool only
carries the timing harness).

    python tools/profile_stages.py [pll|afsk] [n_chains]

Each timing forces a scalar readback; ~24-31 ms of tunnel round trip
rides on every line.  NOTE the FIRST row therefore absorbs the RTT --
"frames 26 ms" is ~3 ms of actual framing; only the DIFFERENCES between
adjacent rows are meaningful stage costs (this misattribution sent a
round-4 session chasing a framing copy that barely exists).
"""

import sys
import time
from dataclasses import replace
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> int:
    family = sys.argv[1] if len(sys.argv) > 1 else "pll"
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else (
        8 if family == "pll" else 64)

    from pymodem_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from scipy.io import wavfile

    from pymodem_tpu.config import load_plan
    from pymodem_tpu.dsp.fir import fir_valid_multi, fir_valid_nd
    from pymodem_tpu.ops.lfsr import descramble_bytes_multi
    from pymodem_tpu.ops.pallas_slicers import binary_slice_lanes_pallas
    from pymodem_tpu.ops.slicers import compact_windowed
    from pymodem_tpu.ops.sync import il2p_sync_candidates
    from pymodem_tpu.runtime import bank as B

    rate, audio = wavfile.read(
        "/root/reference/audio_samples/afsk_300_il2pc_noise.wav"
    )
    plan_cfg = load_plan("/root/reference/configs/afsk_300.json", rate)
    if family == "pll":
        base = [c for c in plan_cfg.chains
                if c.name == "AFSK 300 Il2Pc PLL inverted"][0]
        chains = [replace(base, name=f"pll{i}",
                          modem=replace(base.modem, carrier_freq=1696.0 + i))
                  for i in range(n_chains)]
    else:
        base = [c for c in plan_cfg.chains
                if c.name == "AFSK 300 Il2Pc Correlator"][0]
        chains = [replace(base, name=f"s{i}",
                          modem=replace(base.modem,
                                        space_gain=0.7 + 0.005 * i))
                  for i in range(n_chains)]
    hour = 3600 * rate
    tiled = jax.device_put(np.tile(audio, -(-hour // len(audio)))[:hour])
    dtype = jnp.float32
    bank = B.group_chains(chains, dtype)[0]
    # the runtime's own aligned auto geometry (max_packet bound as in
    # bench.py) so marginal costs reflect what the bench actually runs
    plan, g = B.plan_bank_run(bank, hour, rate, dtype, "auto", "auto", 3.0,
                              "auto")
    g = g or plan.n_blocks
    st = B._slicer_static(bank)
    cap = B.bank_capacity(bank, plan)
    params = bank.params
    w = st["compact_window"]
    print(f"family={family} chains={n_chains} n_blocks={plan.n_blocks} "
          f"Lin={plan.block_input_len} group={g} cap={cap} window={w}")

    n_groups = -(-plan.n_blocks // g)
    total = n_groups * g * plan.block_len + plan.overlap + plan.trim
    win_len = (g - 1) * plan.block_len + plan.block_input_len

    @partial(jax.jit, static_argnames=("stage",))
    def run(audio, stage):
        padded = jnp.pad(
            audio, (plan.overlap, total - plan.overlap - plan.n_audio)
        )

        def body(start):
            win = jax.lax.dynamic_slice(padded, (start,), (win_len,))
            frames = B.overlapped_frames(
                win, g, plan.block_len,
                plan.block_input_len - plan.block_len,
            ).astype(dtype)
            if stage == "frames":
                return (jnp.sum(frames),)
            m = params["modem"]
            if family == "pll":
                if stage == "bpf":
                    x = jax.vmap(
                        lambda t: fir_valid_nd(frames, t, "auto")
                    )(m["input_bpf"])
                    return (jnp.sum(x),)
                bb = B.coherent_bank_demod_pallas(
                    bank.kind, params, frames, "auto", 8
                )
                if stage == "loop":
                    return (jnp.sum(bb),)
            else:
                def one(cp):
                    mm = cp["modem"]
                    x = fir_valid_nd(frames, mm["input_bpf"], "auto")
                    if stage == "bpf":
                        return jnp.sum(x)
                    corr = jnp.stack([mm["mark_i"], mm["mark_q"],
                                      mm["space_i"], mm["space_q"]])
                    mi, mq, si, sq = fir_valid_multi(x, corr, "auto")
                    if stage == "corr":
                        return jnp.sum(mi) + jnp.sum(sq)
                    diff = (jnp.sqrt(mi * mi + mq * mq)
                            - jnp.sqrt(si * si + sq * sq))
                    return jnp.sum(
                        fir_valid_nd(diff, mm["output_lpf"], "auto")
                    )
                if stage in ("bpf", "corr", "lpf"):
                    return (jax.vmap(one)(params),)
                bb = jax.vmap(
                    lambda cp: B.demod_blocks(bank.kind, dict(cp), frames,
                                              "auto", 8)
                )(params)
            C, Bg, L2 = bb.shape
            lp = jnp.stack([
                jnp.repeat(
                    jnp.asarray(params["sps"], jnp.float32).reshape(C), Bg),
                jnp.repeat(
                    jnp.asarray(params["lock_rate"],
                                jnp.float32).reshape(C), Bg),
            ])
            enc = binary_slice_lanes_pallas(
                bb.reshape(C * Bg, L2), lp, window=w
            ).reshape(C, Bg, -1)
            if stage == "slicer":
                return (jnp.sum(enc),)
            data, addr, count = jax.vmap(jax.vmap(
                lambda e: compact_windowed(e, w, cap)
            ))(enc)
            if stage == "compact":
                return (jnp.sum(data), jnp.sum(count))

            d = descramble_bytes_multi(
                data.astype(jnp.uint8), bank.stream_polys,
                bank.stream_inverts,
            )
            sy = B.pack_bits(il2p_sync_candidates(d, 0))
            return (jnp.sum(d.astype(jnp.int32)),
                    jnp.sum(sy.astype(jnp.int32)))

        starts = jnp.arange(n_groups, dtype=jnp.int32) * (g * plan.block_len)
        outs = jax.lax.map(body, starts)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    stages = (["frames", "bpf", "loop", "slicer", "compact", "full"]
              if family == "pll"
              else ["frames", "bpf", "corr", "lpf", "slicer", "compact",
                    "full"])
    for stage in stages:
        float(np.asarray(run(tiled, stage)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(run(tiled, stage)))
            best = min(best, time.perf_counter() - t0)
        print(f"{stage:<10} {best*1e3:7.1f}ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
