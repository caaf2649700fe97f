"""Two-process jax.distributed decode: the multi-host execution path.

Spawns 2 worker processes (4 virtual CPU devices each) that share one
('chain'=1, 'time'=8) mesh -- the time axis, including the AGC pmax
collective and the result allgather, crosses the process boundary (the
DCN analog of a 2-host pod).  Both processes must report identical
packets, equal to a single-process banked decode of the same audio.
"""

import json
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _ground_truth():
    sys.path.insert(0, HERE)
    import _mh_case as case
    from pymodem_tpu.runtime.bank import run_banked

    chains, audio = case.build()
    out = run_banked(chains, audio, block_seconds=case.BLOCK_SECONDS,
                     overlap_seconds=case.OVERLAP_SECONDS)
    return case.packets_as_json(out)


def test_two_process_sharded_decode():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    port = "29781"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outputs.append(out)
        assert p.returncode == 0, out[-3000:]
    results = {}
    for out in outputs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-3000:]
        r = json.loads(lines[-1][len("RESULT "):])
        results[r["process"]] = r["packets"]
    assert set(results) == {0, 1}
    # both hosts hold the identical gathered packet set
    assert results[0] == results[1]
    truth = _ground_truth()
    assert results[0] == truth
    assert sum(len(v) for v in truth.values()) >= 8  # 4 frames x 2 chains
