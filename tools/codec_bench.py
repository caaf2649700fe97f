"""Micro-bench: where does the device IL2P codec step spend its time?

Times rs_decode_jax at the bench-hour shapes (header 2-root and payload
16-root codes) and the full il2p_decode_blocks on synthetic candidate
populations, so codec-side optimizations are measured in isolation.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit(fn, *args, reps=3):
    import jax.numpy as jnp

    out = fn(*args)
    _ = float(np.asarray(jnp.sum(out[0] if isinstance(out, tuple) else out)))
    best = float("inf")
    for _i in range(reps):
        t0 = time.time()
        out = fn(*args)
        _ = float(
            np.asarray(jnp.sum(out[0] if isinstance(out, tuple) else out))
        )
        best = min(best, time.time() - t0)
    return best


def main():
    from pymodem_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from pymodem_tpu.ops import rs as rs_ops

    rng = np.random.default_rng(7)

    # payload code at the PLL-hour budget: Rb = 32768 blocks of 255
    for B, nroots, L in ((16384, 2, 15), (32768, 16, 255)):
        msg = rng.integers(0, 256, (B, L - nroots), dtype=np.int32)
        code = rs_ops.RS_HEADER if nroots == 2 else rs_ops.RS_BLOCK
        enc = np.stack([rs_ops.rs_encode_np(code, m) for m in msg[:64]])
        data = np.tile(enc, (B // 64 + 1, 1))[:B]
        # inject a couple of byte errors in half the blocks
        flips = rng.integers(0, L, (B, 2))
        data[np.arange(B)[:, None], flips] ^= (
            rng.integers(1, 256, (B, 2)) * (np.arange(B)[:, None] % 2 == 0)
        )
        d = jnp.asarray(data)
        bs = jnp.full((B,), L, jnp.int32)
        t = timeit(
            lambda a, b: rs_ops.rs_decode_jax(a, b, num_roots=nroots), d, bs
        )
        print(
            f"rs_decode_jax B={B} roots={nroots} L={L}: {t*1e3:7.1f}ms "
            f"({B/t/1e3:.1f} kblocks/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
