"""Stage-by-stage timing of the grouped PLL bank device program on TPU.

Times cumulative prefixes of the pipeline (frames gather -> FIR -> AGC ->
loop -> output FIR -> slicer+compact -> descramble+sync) at the bench-hour
shapes, so each stage's marginal cost is the difference between lines.
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
    from dataclasses import replace
    from functools import partial
    from scipy.io import wavfile

    from pymodem_tpu.config import load_plan
    from pymodem_tpu.runtime import bank as B

    rate, audio = wavfile.read(
        "/root/reference/audio_samples/afsk_300_il2pc_noise.wav"
    )
    plan_cfg = load_plan("/root/reference/configs/afsk_300.json", rate)
    base = [
        c for c in plan_cfg.chains if c.name == "AFSK 300 Il2Pc PLL inverted"
    ][0]
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    chains = [
        replace(base, name=f"pll{i}",
                modem=replace(base.modem, carrier_freq=1696.0 + i))
        for i in range(n_chains)
    ]
    hour = 3600 * rate
    tiled = np.tile(audio, -(-hour // len(audio)))[:hour]

    dtype = jnp.float32
    bank = B.group_chains(chains, dtype)[0]
    plan = B.default_block_plan(len(tiled), bank.trim, rate)
    g = B.auto_blocks_per_step(
        n_chains, plan.block_input_len, plan.n_blocks, dtype
    ) or plan.n_blocks
    st = B._slicer_static(bank)
    cap = B.bank_capacity(bank, plan)
    print(f"chains={n_chains} g={g} n_blocks={plan.n_blocks} cap={cap}")

    n_groups = -(-plan.n_blocks // g)
    total = n_groups * g * plan.block_len + plan.overlap + plan.trim
    wire = jnp.asarray(np.pad(tiled, (plan.overlap, total - plan.overlap - len(tiled))))

    from pymodem_tpu.dsp.loops import LoopParams
    from pymodem_tpu.dsp.pallas_loops import (
        lane_params_from_loop, loop_lanes_pallas,
    )
    from pymodem_tpu.runtime.bank import (
        _agc_blocks, fir_valid_nd, slice_blocks, descramble_bytes, pack_bits,
    )
    from pymodem_tpu.ops.sync import il2p_sync_candidates

    m = bank.params["modem"]

    def stage_fn(depth):
        @partial(jax.jit, static_argnames=())
        def run(padded):
            def body(start):
                win = jax.lax.dynamic_slice(
                    padded, (start,),
                    ((g - 1) * plan.block_len + plan.block_input_len,),
                )
                frames = B.overlapped_frames(
                    win, g, plan.block_len,
                    plan.block_input_len - plan.block_len,
                ).astype(dtype)
                if depth == 0:
                    return jnp.sum(frames)
                x = jax.vmap(
                    lambda taps: fir_valid_nd(frames, taps, "auto")
                )(m["input_bpf"])
                if depth == 1:
                    return jnp.sum(x)
                normals = jnp.max(x, axis=(1, 2))
                x = jax.vmap(
                    lambda xi, agc_c, nm: _agc_blocks(xi, agc_c, 8, nm)
                )(x, m["agc"], normals)
                if depth == 2:
                    return jnp.sum(x)
                C, Bb, L1 = x.shape
                loop = LoopParams(**bank.params["loop"])
                lane_params = lane_params_from_loop(loop, C, Bb)
                demod = loop_lanes_pallas(
                    x.reshape(C * Bb, L1), lane_params, "afsk_pll",
                    wavetable_size=loop.wavetable.shape[-1],
                ).reshape(C, Bb, L1)
                if depth == 3:
                    return jnp.sum(demod)
                bb = jax.vmap(
                    lambda d, t: fir_valid_nd(d, t, "auto")
                )(demod, m["output_lpf"])
                if depth == 4:
                    return jnp.sum(bb)

                def tail(chain_params, baseband):
                    chain_params = dict(chain_params)
                    chain_params["slicer_static"] = {
                        "state_mask": st["state_mask"],
                        "bits_per_symbol": st["bits_per_symbol"],
                    }
                    data, addr, count = slice_blocks(
                        bank.slicer_kind, chain_params, baseband, cap, 8,
                        st["compact_window"],
                    )
                    data = data.astype(jnp.uint8)
                    if bank.stream_poly not in (0, 1) or bank.stream_invert:
                        data = descramble_bytes(
                            data, bank.stream_poly, bank.stream_invert
                        )
                    if depth == 5:
                        return data, addr, count
                    sync = il2p_sync_candidates(data, 0)
                    return data, addr, count, pack_bits(sync)

                out = jax.vmap(tail)(bank.params, bb)
                return sum(jnp.sum(o) for o in out)

            starts = jnp.arange(n_groups, dtype=jnp.int32) * (
                g * plan.block_len
            )
            return jnp.sum(jax.lax.map(body, starts))

        return run

    names = ["frames", "+input_fir", "+agc", "+loop", "+out_fir",
             "+slicer+lfsr", "+sync"]
    for depth, name in enumerate(names):
        fn = stage_fn(depth)
        _ = float(np.asarray(fn(wire)))
        best = float("inf")
        for _i in range(3):
            t0 = time.time()
            _ = float(np.asarray(fn(wire)))
            best = min(best, time.time() - t0)
        print(f"{name:<14} {best*1e3:8.1f}ms", flush=True)


if __name__ == "__main__":
    main()
