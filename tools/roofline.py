#!/usr/bin/env python
"""Per-kernel throughput measurements on the local accelerator.

Times each hot kernel at bench shapes and reports achieved rates against
TPU v5e single-chip ceilings (HBM ~819 GB/s, VPU f32 ~ 2 TFLOP/s,
MXU bf16/f32 ~ 197/99 TFLOP/s).  Timing forces a scalar readback because
block_until_ready does not synchronize on this backend.

    python tools/roofline.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(fn, *args):
    import jax.numpy as jnp

    float(np.asarray(jnp.sum(fn(*args))))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(jnp.sum(fn(*args))))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    from pymodem_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from pymodem_tpu.dsp import window_design as wd
    from pymodem_tpu.dsp.agc import agc_apply
    from pymodem_tpu.dsp.fir import fir_valid_nd
    from pymodem_tpu.dsp.loops import LoopParams, afsk_pll
    from pymodem_tpu.dsp.pallas_loops import (
        lane_params_from_loop,
        loop_lanes_pallas,
    )
    from pymodem_tpu.ops import rs as rs_ops
    from pymodem_tpu.ops.slicers import binary_slice, compact_bytes

    C, B, N = 32, 40, 176_000
    samples = C * B * N
    x = jnp.asarray(np.random.randn(C, B, N).astype(np.float32))
    rows = []

    h187 = jnp.asarray(np.random.randn(187).astype(np.float32))
    dt = timed(lambda: fir_valid_nd(x, h187, "matmul"))
    rows.append(("Toeplitz-matmul conv (MXU), 187 taps", samples / dt / 1e9,
                 "Gsamples/s", f"{samples * 630 / dt / 1e12:.1f} TFLOP/s"))
    dt = timed(lambda: fir_valid_nd(x, h187, "fft"))
    rows.append(("overlap-save FFT conv, 187 taps", samples / dt / 1e9,
                 "Gsamples/s", f"{samples * 4 * 2 / dt / 1e9:.0f} GB/s eff"))

    h8 = jnp.asarray(np.random.randn(8).astype(np.float32))
    dt = timed(lambda: fir_valid_nd(x, h8, "shift"))
    rows.append(("shift-MAC conv, 8 taps", samples / dt / 1e9, "Gsamples/s",
                 f"{samples * 16 / dt / 1e12:.2f} TFLOP/s"))

    sl = lambda row: binary_slice(row, jnp.float32(26.667), jnp.float32(0.75))
    dt = timed(jax.jit(lambda v: jax.vmap(jax.vmap(
        lambda r: compact_bytes(sl(r), 1032, 64)[0]))(v)), x)
    rows.append(("slicer scan + windowed compaction", samples / dt / 1e9,
                 "Gsamples/s", f"{C * B} lanes"))

    from pymodem_tpu.ops.pallas_slicers import binary_slice_lanes_pallas
    from pymodem_tpu.ops.slicers import compact_windowed

    slp = jnp.stack([jnp.full((C * B,), 26.667, jnp.float32),
                     jnp.full((C * B,), 0.75, jnp.float32)])
    dt = timed(jax.jit(lambda v: jax.vmap(
        lambda e: compact_windowed(e, 64, 1032)[0]
    )(binary_slice_lanes_pallas(v.reshape(C * B, N), slp, window=64))), x)
    rows.append(("Pallas slicer lanes (windowed emit)", samples / dt / 1e9,
                 "Gsamples/s", f"{C * B} lanes"))

    from pymodem_tpu.ops.pallas_slicers import (
        four_level_slice_lanes_pallas,
        quadrature_slice_lanes_pallas,
    )

    y = jnp.asarray(np.random.randn(C, B, N).astype(np.float32))
    qd = (3, 1, 0, 2)
    dt = timed(jax.jit(lambda i, q: jax.vmap(
        lambda e: compact_windowed(e, 64, 1032)[0]
    )(quadrature_slice_lanes_pallas(
        i.reshape(C * B, N), q.reshape(C * B, N), slp, qd, 0xF, 2,
        window=64))), x, y)
    rows.append(("Pallas quadrature slicer lanes", samples / dt / 1e9,
                 "Gsamples/s", f"{C * B} lanes"))

    dt = timed(jax.jit(lambda v: jax.vmap(
        lambda e: compact_windowed(e, 64, 1032)[0]
    )(four_level_slice_lanes_pallas(
        v.reshape(C * B, N), slp, (2, 0, 3, 1), window=64))), x)
    rows.append(("Pallas 4-level slicer lanes", samples / dt / 1e9,
                 "Gsamples/s", f"{C * B} lanes"))

    agc = lambda r: agc_apply(r, jnp.float32(0.0625), jnp.float32(0.00625),
                              jnp.float32(1.0), jnp.float32(1 / 8000),
                              jnp.float32(1.0), normal=jnp.float32(3.0))
    dt = timed(jax.jit(lambda v: jax.vmap(jax.vmap(agc))(v)), x)
    rows.append(("AGC scan", samples / dt / 1e9, "Gsamples/s", ""))

    b0, a1 = wd.iir1_lpf_coefs(8000.0, 150.0, 1.0)
    lp = LoopParams(
        wavetable=jnp.asarray(wd.nco_wavetable(256, 1.0), jnp.float32),
        set_frequency=jnp.float32(1700), phase_scale=jnp.float32(2 * np.pi / 8000),
        index_scale=jnp.float32(256 / (2 * np.pi)), iir_b0=jnp.float32(b0),
        iir_a1=jnp.float32(a1), pi_gp=jnp.float32(540), pi_gain=jnp.float32(900),
        pi_i=jnp.float32(1e-4), pi_limit=jnp.float32(50),
        pi_integral0=jnp.float32(0),
    )
    dt = timed(jax.jit(lambda v: jax.vmap(jax.vmap(
        lambda r: afsk_pll(r, lp)))(v)), x)
    rows.append(("PLL scan (NCO+IIR+PI)", samples / dt / 1e9, "Gsamples/s", ""))

    lane_p = lane_params_from_loop(
        LoopParams(*[jnp.asarray(np.asarray(v)[None]) for v in lp]), 1, C * B
    )
    dt = timed(lambda: loop_lanes_pallas(x.reshape(C * B, N), lane_p,
                                         "afsk_pll"))
    rows.append(("PLL Pallas kernel (carry in VMEM)", samples / dt / 1e9,
                 "Gsamples/s", f"{C * B} lanes"))

    blocks = jnp.asarray(
        np.random.randint(0, 256, (8192, 255)).astype(np.int32))
    sizes = jnp.full((8192,), 255, jnp.int32)
    dt = timed(lambda: rs_ops.rs_decode_jax(blocks, sizes, num_roots=16)[0])
    rows.append(("RS(255,239) batched decode", 8192 / dt / 1e3, "kblocks/s",
                 f"{8192 * 255 / dt / 1e6:.0f} MB/s"))

    print(f"{'kernel':40} {'rate':>10}  unit        notes")
    for name, rate, unit, note in rows:
        print(f"{name:40} {rate:10.2f}  {unit:10}  {note}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
