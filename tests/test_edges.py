"""Edge cases: tiny/empty inputs, degenerate plans, CLI robustness."""

import numpy as np
import pytest

from pymodem_tpu.config import (
    AFSKModemSpec,
    BinarySlicerSpec,
    ChainSpec,
    IL2PCodecSpec,
    LFSRStreamSpec,
    load_plan,
)
from pymodem_tpu.runtime.bank import run_banked
from pymodem_tpu.runtime.executor import run_chain


def _chain():
    return ChainSpec(
        name="edge",
        modem=AFSKModemSpec(sample_rate=8000.0),
        slicer=BinarySlicerSpec(sample_rate=8000.0, symbol_rate=1200.0,
                                lock_rate=0.75),
        stream=LFSRStreamSpec(polynomial=0x3, invert=False),
        codec=IL2PCodecSpec(ident="edge"),
    )


def test_short_audio_sequential():
    """Audio barely longer than the FIR trim decodes to zero packets."""
    audio = np.zeros(400, dtype=np.int16)
    assert run_chain(_chain(), audio) == []


def test_short_audio_banked():
    audio = np.zeros(2000, dtype=np.int16)
    out = run_banked([_chain()], audio)
    assert out == {"edge": []}


def test_silence_banked():
    """A minute of silence: no packets, no crashes."""
    audio = np.zeros(8000 * 60, dtype=np.int16)
    out = run_banked([_chain()], audio)
    assert out == {"edge": []}


def test_empty_plan(tmp_path):
    cfg = tmp_path / "empty.json"
    cfg.write_text(
        '{"object_name": "r", "object_type": "report", '
        '"options": {"style": "decoded_headers"}}\n'
    )
    plan = load_plan(str(cfg), 8000.0)
    assert plan.chains == ()
    assert len(plan.reports) == 1


def test_dc_and_fullscale_audio():
    """Constant full-scale input (degenerate AGC/slicer regime)."""
    audio = np.full(8000 * 5, 32767, dtype=np.int16)
    out = run_banked([_chain()], audio)
    assert out == {"edge": []}


def test_compact_windowed_large_block_addresses():
    """The packed single-scatter compaction must keep addresses exact far
    past window index 32768 (a windex overflow would flip the int32 sign
    bit: observed addr -260284 before the width fix), and blocks beyond
    the 2^23-sample pack budget must take the two-scatter fallback with
    identical results."""
    import jax.numpy as jnp

    from pymodem_tpu.ops.slicers import compact_windowed

    rng = np.random.default_rng(11)
    for window, nw in ((8, 40_000), (16, 60_000), (4, 3_000_000)):
        # sparse emissions, including one in the LAST window
        hot = np.unique(
            np.concatenate([
                rng.integers(0, nw, 200), [0, 32_999, nw - 1]
            ])
        )
        enc = np.zeros(nw, np.int32)
        poff = rng.integers(0, window, len(hot))
        byte = rng.integers(0, 256, len(hot))
        enc[hot] = (poff << 16) | 0x100 | byte
        cap = 256
        data, addr, count = map(
            np.asarray, compact_windowed(jnp.asarray(enc), window, cap)
        )
        n = min(len(hot), cap)
        assert int(count) == len(hot)
        expect_addr = hot * window + poff + 1
        assert (addr[:n] > 0).all()
        np.testing.assert_array_equal(addr[:n], expect_addr[:n])
        np.testing.assert_array_equal(data[:n], byte[:n])
        assert (addr[n:] == 0).all() and (data[n:] == 0).all()
