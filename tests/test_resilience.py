"""Skip-and-continue runtime resilience (reference chain_execute.py:8-27).

The reference wraps every pipeline stage in try/except, prints
"skipped <stage>" and continues; a dead chain contributes nothing (and in
the reference hangs the queue gather, pymodem.py:158-163 -- fixed forward
here).  These tests assert the analog: a chain that raises mid-run is
skipped with a message while the surviving chains still decode.
"""

import json

import numpy as np
import pytest


def _two_chain_plan(tmp_path):
    from pymodem_tpu.config import load_plan

    chain = {
        "object_name": "good", "object_type": "demod_chain",
        "modem": {"type": "afsk", "config": "1200", "options": {}},
        "slicer": {"type": "binary", "config": "1200", "options": {}},
        "stream": {"type": "lfsr", "options": {"poly": "0x3", "invert": "no"}},
        "codec": {"type": "il2p", "options": {"crc": "yes"}},
    }
    bad = dict(chain, object_name="bad")
    report = {
        "object_name": "report", "object_type": "report",
        "options": {"style": "decoded_headers", "destination": "std_out"},
    }
    cfg = tmp_path / "two.json"
    cfg.write_text("\n".join(json.dumps(o) for o in (bad, chain, report)))
    return load_plan(str(cfg), 8000.0)


def _audio():
    from pymodem_tpu.synth import fixtures as fx
    from pymodem_tpu.synth import modulate as mod

    rng = np.random.default_rng(5)
    sent = fx.payloads(rng, count=2, size=25)
    line = fx.il2p_line_bits(sent, polynomial=0x3, invert=False)
    return mod.to_int16(
        mod.afsk_modulate(line, 8000.0, 1200.0, 1200.0, 2200.0)
    ).astype(np.int16)


def _fail_chain_named(monkeypatch, name):
    from pymodem_tpu.runtime import executor

    real = executor.run_chain

    def flaky(spec, audio, **kw):
        if spec.name == name:
            raise RuntimeError("injected device failure")
        return real(spec, audio, **kw)

    monkeypatch.setattr(executor, "run_chain", flaky)


def test_sequential_plan_skips_failed_chain(tmp_path, monkeypatch, capsys):
    from pymodem_tpu.runtime.executor import run_plan

    plan = _two_chain_plan(tmp_path)
    _fail_chain_named(monkeypatch, "bad")
    result = run_plan(plan, _audio(), 8000.0)
    out = capsys.readouterr().out
    assert "skipped chain bad" in out
    assert "injected device failure" in out
    # the surviving chain still decodes both packets
    assert sum(1 for p in result.aggregate.unique if p.valid_crc) == 2

    with pytest.raises(RuntimeError):
        run_plan(plan, _audio(), 8000.0, resilient=False)


def test_banked_plan_falls_back_and_skips(tmp_path, monkeypatch, capsys):
    from pymodem_tpu.runtime import bank
    from pymodem_tpu.runtime.bank import run_plan_banked

    plan = _two_chain_plan(tmp_path)

    def broken_bank(*a, **kw):
        raise RuntimeError("injected bank failure")

    monkeypatch.setattr(bank, "run_banked", broken_bank)
    _fail_chain_named(monkeypatch, "bad")
    result = run_plan_banked(plan, _audio(), 8000.0)
    out = capsys.readouterr().out
    assert "banked runtime failed" in out
    assert "skipped chain bad" in out
    assert sum(1 for p in result.aggregate.unique if p.valid_crc) == 2

    with pytest.raises(RuntimeError):
        run_plan_banked(plan, _audio(), 8000.0, resilient=False)
