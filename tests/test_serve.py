"""Decode server (CLI warm pool): routed output == direct CLI output."""

import os
import re
import subprocess
import sys
import time

import pytest

CONFIG = "/root/reference/configs/afsk_300_pll.json"
WAV = "/root/reference/audio_samples/afsk_300_il2pc_noise.wav"


def _strip_timing(text: str) -> str:
    return re.sub(r"Elapsed time: [0-9.]+ seconds\.", "Elapsed time: X", text)


@pytest.mark.skipif(not os.path.exists(WAV), reason="fixture not available")
def test_server_roundtrip(tmp_path):
    sock = str(tmp_path / "pymodem.sock")
    env = dict(os.environ, PYMODEM_TPU_X64="1")
    # server output goes to a FILE: XLA's C++ logging writes multi-KB lines
    # straight to fd 2, and an undrained pipe would block the server
    server_log = open(tmp_path / "server.log", "w+")
    server = subprocess.Popen(
        [sys.executable, "-m", "pymodem_tpu.serve", sock],
        env=env, stdout=server_log, stderr=subprocess.STDOUT, text=True,
        cwd="/root/repo",
    )

    def log_tail():
        server_log.flush()
        return open(tmp_path / "server.log").read()[-2000:]

    try:
        for _ in range(600):
            if os.path.exists(sock):
                break
            if server.poll() is not None:
                raise AssertionError(log_tail())
            time.sleep(0.1)
        else:
            raise AssertionError("server socket never appeared")

        cenv = dict(env, PYMODEM_TPU_SERVER=sock)

        def cli(*args):
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, "-m", "pymodem_tpu", *args],
                env=cenv, capture_output=True, text=True, cwd="/root/repo",
                timeout=600,
            )
            return r.returncode, r.stdout, time.time() - t0

        direct = subprocess.run(
            [sys.executable, "-m", "pymodem_tpu", CONFIG, WAV],
            env=env, capture_output=True, text=True, cwd="/root/repo",
            timeout=600,
        )
        assert direct.returncode == 0, direct.stdout[-2000:]

        code1, out1, t1 = cli(CONFIG, WAV)
        assert code1 == 0, out1[-2000:]
        code2, out2, t2 = cli(CONFIG, WAV)
        assert code2 == 0

        # identical decode output across server requests and vs direct CLI
        assert _strip_timing(out1) == _strip_timing(out2)
        assert _strip_timing(out1) == _strip_timing(direct.stdout)
        assert "Unique, valid packets:  48" in out1

        # exit codes pass through the server
        code_bad, out_bad, _ = cli(CONFIG, "/nonexistent.wav")
        assert code_bad == 4, out_bad
    finally:
        server.terminate()
        server.wait(timeout=30)


@pytest.mark.skipif(not os.path.exists(WAV), reason="fixture not available")
def test_batch_pipelines_across_configs(monkeypatch):
    """A drained server batch decodes as ONE pipelined unit even when the
    queued requests use DIFFERENT config files (run_decode_batch ->
    bank.run_plans_banked_pipelined): per-request output matches the
    one-shot CLI byte for byte (modulo wall-clock lines)."""
    import contextlib
    import io

    from pymodem_tpu.cli import run_decode, run_decode_batch

    monkeypatch.setenv("PYMODEM_TPU_RUNTIME", "banked")
    cfg_b = "/root/reference/configs/afsk_300.json"
    if not os.path.exists(cfg_b):
        pytest.skip("reference configs not available")
    reqs = [(CONFIG, WAV), (cfg_b, WAV), (CONFIG, WAV)]
    results = run_decode_batch(reqs)
    assert [code for code, _ in results] == [0, 0, 0]
    # the two same-config requests must agree exactly
    assert _strip_timing(results[0][1]) == _strip_timing(results[2][1])
    for (config, wav), (code, output) in zip(reqs, results):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            direct = run_decode(config, wav)
        assert direct == code == 0
        assert _strip_timing(output) == _strip_timing(buf.getvalue())

    # validation failures keep their per-request exit codes inside a batch
    bad = run_decode_batch([(CONFIG, "/nonexistent.wav"),
                            ("/nonexistent.json", WAV), (CONFIG, WAV)])
    assert [code for code, _ in bad] == [4, 3, 0]


@pytest.mark.skipif(not os.path.exists(WAV), reason="fixture not available")
def test_batch_diagnostics_degrade_to_per_job(monkeypatch):
    """A batch whose pipelined run emits resilience diagnostics cannot
    attribute them to the producing request, so it degrades to
    one-at-a-time runs (cli.run_decode_batch): every response then
    carries only its own job's output, and no response contains the
    batch-scope diagnostic."""
    from pymodem_tpu import cli
    from pymodem_tpu.runtime import bank as bank_mod

    monkeypatch.setenv("PYMODEM_TPU_RUNTIME", "banked")
    real = bank_mod.run_plans_banked_pipelined

    def spy(jobs, depth=1):
        print("banked runtime failed for SOME chain (synthetic)")
        return real(jobs, depth=depth)

    monkeypatch.setattr(bank_mod, "run_plans_banked_pipelined", spy)
    results = cli.run_decode_batch([(CONFIG, WAV), (CONFIG, WAV)])
    assert [code for code, _ in results] == [0, 0]
    for _code, output in results:
        assert "synthetic" not in output
        assert "Unique packets" in output or "packets" in output
