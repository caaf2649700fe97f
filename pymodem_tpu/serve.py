"""Persistent decode server: the CLI warm pool.

On a tunneled TPU a one-shot CLI process pays ~30-40 s of executable load
per bank program (CLAUDE.md); the decode itself is seconds.  This server
keeps one live process whose jit caches (and loaded TPU executables)
persist across requests, so every invocation after the first runs at
decode speed.

    # start once (stays in the foreground; & to background it)
    python -m pymodem_tpu.serve /tmp/pymodem.sock

    # every CLI call now routes through the warm process
    PYMODEM_TPU_SERVER=/tmp/pymodem.sock \
        python -m pymodem_tpu <config.json> <audio.wav>

Protocol: one JSON request line per connection over a unix socket --
``{"config": <abs path>, "wav": <abs path>}`` -> one JSON response line
``{"code": <exit code>, "output": <captured stdout>}``.  A request of
``{"op": "shutdown"}`` stops the server.  Requests are served one at a
time (the TPU tunnel serializes concurrent processes anyway; one warm
process is the point).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import socket
import sys
import traceback


def client_request(sock_path: str, config: str, wav: str,
                   timeout: float = 3600.0) -> tuple[int, str]:
    """Send one decode request to a running server; returns (code, output)."""
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.settimeout(timeout)
        s.connect(sock_path)
        req = {"config": os.path.abspath(config), "wav": os.path.abspath(wav)}
        s.sendall((json.dumps(req) + "\n").encode())
        with s.makefile("r") as f:
            resp = json.loads(f.readline())
    return int(resp["code"]), resp["output"]


def client_shutdown(sock_path: str) -> None:
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.connect(sock_path)
        s.sendall(b'{"op": "shutdown"}\n')
        with s.makefile("r") as f:
            f.readline()


def serve(sock_path: str) -> int:
    """Run the decode server until shutdown.  Blocks."""
    from .cli import run_decode

    try:
        os.unlink(sock_path)
    except FileNotFoundError:
        pass
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(sock_path)
    srv.listen(4)
    print(f"pymodem_tpu decode server listening on {sock_path}", flush=True)
    try:
        while True:
            conn, _ = srv.accept()
            with conn:
                with conn.makefile("r") as f:
                    line = f.readline()
                if not line.strip():
                    continue
                try:
                    req = json.loads(line)
                except json.JSONDecodeError:
                    conn.sendall(b'{"code": 1, "output": "bad request"}\n')
                    continue
                if req.get("op") == "shutdown":
                    conn.sendall(b'{"code": 0, "output": "bye"}\n')
                    return 0
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    try:
                        code = run_decode(req["config"], req["wav"])
                    except SystemExit as exc:  # defensive: cli uses returns
                        code = int(exc.code or 0)
                    except Exception:
                        traceback.print_exc(file=buf)
                        code = 1
                resp = {"code": code, "output": buf.getvalue()}
                conn.sendall((json.dumps(resp) + "\n").encode())
    finally:
        srv.close()
        try:
            os.unlink(sock_path)
        except FileNotFoundError:
            pass


def main(argv=None) -> int:
    argv = list(sys.argv if argv is None else argv)
    if len(argv) != 2:
        print("Usage: python -m pymodem_tpu.serve <socket path>")
        return 2
    return serve(argv[1])


if __name__ == "__main__":
    raise SystemExit(main())
