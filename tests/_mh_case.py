"""Shared test case for the two-process multihost test.

Importable by both the worker (after jax.distributed init) and the parent
test (single process) so the chains, audio, and block geometry are
identical.  Audio is padded so n_blocks is exactly N_BLOCKS -- the sharded
runtime's round-up then never changes the block plan, making sharded
results bit-comparable with the single-process banked run.
"""

import numpy as np

BLOCK_SECONDS = 4.0
OVERLAP_SECONDS = 3.0  # > one 300 bps IL2P frame duration (~2.1 s)
N_BLOCKS = 4
RATE = 8000


def build():
    import jax.numpy as jnp

    from pymodem_tpu.config import (
        AFSKPLLModemSpec,
        BinarySlicerSpec,
        ChainSpec,
        IL2PCodecSpec,
        LFSRStreamSpec,
    )
    from pymodem_tpu.runtime import bank as B
    from pymodem_tpu.synth import fixtures as fx
    from pymodem_tpu.synth import modulate as mod

    chains = [
        ChainSpec(
            name=f"pll{i}",
            modem=AFSKPLLModemSpec(sample_rate=float(RATE),
                                   carrier_freq=1700.0 + i),
            slicer=BinarySlicerSpec(sample_rate=float(RATE), symbol_rate=300.0,
                                    lock_rate=0.75),
            stream=LFSRStreamSpec(polynomial=0x3, invert=False),
            codec=IL2PCodecSpec(ident=f"pll{i}"),
        )
        for i in range(2)
    ]
    rng = np.random.default_rng(20260817)
    sent = fx.payloads(rng, count=4, size=30)
    line = fx.il2p_line_bits(sent, polynomial=0x3, invert=False, gap_bits=400)
    audio = mod.afsk_modulate(line, float(RATE), 300.0, 1695.0, 1705.0)
    trim = B.group_chains(chains, jnp.float64)[0].trim
    target = N_BLOCKS * int(BLOCK_SECONDS * RATE) + trim
    assert len(audio) <= target, (len(audio), target)
    audio = np.pad(audio, (0, target - len(audio)))
    return chains, audio


def packets_as_json(out):
    return {
        name: [[int(p.streamaddress), list(map(int, p.data))] for p in pkts]
        for name, pkts in out.items()
    }
