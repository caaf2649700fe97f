"""Worker process for the two-host sharded decode test.

Usage: python multihost_worker.py <process_id> <port>

Each of the 2 processes owns 4 virtual CPU devices; the mesh is
('chain'=2, 'time'=4) laid out so the TIME axis alternates processes --
the AGC pmax collective and the result allgather cross the process
boundary (the DCN analog of a 2-host pod).  The decode case comes from
tests/_mh_case.py (shared with the parent's ground truth); packets are
printed as one JSON line.
"""

import json
import os
import sys

idx = int(sys.argv[1])
port = sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=idx
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

import _mh_case as case  # noqa: E402
from pymodem_tpu.runtime.sharded import run_banked_sharded  # noqa: E402


def main():
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    chains, audio = case.build()
    # (2, 4) grid transposed from (4, 2): each time-axis row alternates
    # process 0 / process 1 devices, so time collectives cross DCN
    grid = np.asarray(jax.devices()).reshape(4, 2).T
    assert {d.process_index for d in grid[0]} == {0, 1}
    mesh = Mesh(grid, ("chain", "time"))
    out = run_banked_sharded(
        chains, audio, mesh,
        block_seconds=case.BLOCK_SECONDS, overlap_seconds=case.OVERLAP_SECONDS,
    )
    print("RESULT " + json.dumps(
        {"process": idx, "packets": case.packets_as_json(out)}), flush=True)


if __name__ == "__main__":
    main()
