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
