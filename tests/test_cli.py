"""CLI surface: reference-parity exit codes and end-to-end decode."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args, env_extra=None):
    env = dict(os.environ)
    env["PYMODEM_TPU_PLATFORM"] = "cpu"
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, "-m", "pymodem_tpu", *args],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
    )


def test_exit_codes(tmp_path):
    assert _run().returncode == 2  # no args (pymodem.py:26-31)
    wav = tmp_path / "x.wav"
    cfg = tmp_path / "c.json"
    cfg.write_text("{}")
    assert _run(str(cfg), str(wav)).returncode == 4  # unreadable wav
    from scipy.io import wavfile

    wavfile.write(str(wav), 8000, np.zeros(8000, dtype=np.int16))
    assert _run(str(tmp_path / "none.json"), str(wav)).returncode == 3


def test_cli_decodes_synthesized_wav(tmp_path):
    from scipy.io import wavfile

    from pymodem_tpu.synth import fixtures as fx
    from pymodem_tpu.synth import modulate as mod

    rng = np.random.default_rng(11)
    sent = fx.payloads(rng, count=2, size=25)
    line = fx.il2p_line_bits(sent, polynomial=0x3, invert=False)
    audio = mod.afsk_modulate(line, 8000.0, 1200.0, 1200.0, 2200.0)
    wav = tmp_path / "afsk.wav"
    wavfile.write(str(wav), 8000, mod.to_int16(audio))
    cfg = tmp_path / "afsk.json"
    cfg.write_text(
        json.dumps({
            "object_name": "AFSK 1200 IL2P", "object_type": "demod_chain",
            "modem": {"type": "afsk", "config": "1200", "options": {}},
            "slicer": {"type": "binary", "config": "1200", "options": {}},
            "stream": {"type": "lfsr", "options": {"poly": "0x3", "invert": "no"}},
            "codec": {"type": "il2p", "options": {"crc": "yes"}},
        }) + "\n" + json.dumps({
            "object_name": "report", "object_type": "report",
            "options": {"style": "decoded_headers", "destination": "std_out"},
        }) + "\n"
    )
    result = _run(str(cfg), str(wav))
    assert result.returncode == 0, result.stderr[-500:]
    assert "Unique, valid packets:  2" in result.stdout
