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
``{"op": "shutdown"}`` stops the server.

Queued requests PIPELINE: after accepting one request the server drains
any further connections already waiting (a short accept window,
PYMODEM_TPU_SERVE_BATCH_WINDOW seconds) and decodes the WHOLE batch --
even across different config files -- through cli.run_decode_batch
(bank.run_plans_banked_pipelined): request i+1's device programs
dispatch before request i's packed readback, hiding the tunnel round
trip and the host report build behind device compute.  A single queued
request takes the one-shot path, byte-identical to the direct CLI.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import socket
import sys
import traceback

MAX_BATCH = 16


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


def _read_request(conn, timeout: float = 10.0):
    """Read one request line; a connected-but-silent client must not hold
    the already-drained batch (or the whole server) hostage."""
    conn.settimeout(timeout)
    try:
        with conn.makefile("r") as f:
            line = f.readline()
    except (socket.timeout, OSError):
        return None
    finally:
        conn.settimeout(None)
    if not line.strip():
        return None
    try:
        return json.loads(line)
    except json.JSONDecodeError:
        conn.sendall(b'{"code": 1, "output": "bad request"}\n')
        return None


def _respond(conn, code: int, output: str) -> None:
    try:
        conn.sendall((json.dumps({"code": code, "output": output}) + "\n").encode())
    except OSError:
        pass  # client gave up; keep serving
    finally:
        conn.close()


def _decode_one(config: str, wav: str) -> tuple[int, str]:
    from .cli import run_decode

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        try:
            code = run_decode(config, wav)
        except SystemExit as exc:  # defensive: cli uses returns
            code = int(exc.code or 0)
        except Exception:
            traceback.print_exc(file=buf)
            code = 1
    return code, buf.getvalue()


def _serve_batch(batch) -> None:
    """Decode a drained request batch as ONE pipelined unit -- requests
    pipeline across DIFFERENT config files too (cli.run_decode_batch);
    a singleton takes the exact one-shot path."""
    from .cli import run_decode_batch

    if len(batch) == 1:
        conn, req = batch[0]
        code, output = _decode_one(req["config"], req["wav"])
        _respond(conn, code, output)
        return
    try:
        results = run_decode_batch(
            [(req["config"], req["wav"]) for _, req in batch]
        )
    except Exception:
        results = None
    if results is None:
        for conn, req in batch:
            code, output = _decode_one(req["config"], req["wav"])
            _respond(conn, code, output)
        return
    for (conn, _req), (code, output) in zip(batch, results):
        _respond(conn, code, output)


def serve(sock_path: str) -> int:
    """Run the decode server until shutdown.  Blocks."""
    try:
        os.unlink(sock_path)
    except FileNotFoundError:
        pass
    window = float(os.environ.get("PYMODEM_TPU_SERVE_BATCH_WINDOW", "0.05"))
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(sock_path)
    srv.listen(MAX_BATCH)
    print(f"pymodem_tpu decode server listening on {sock_path}", flush=True)
    try:
        while True:
            srv.settimeout(None)
            conn, _ = srv.accept()
            batch = []
            shutdown_conn = None
            req = _read_request(conn)
            if req is None:
                conn.close()
                continue
            if req.get("op") == "shutdown":
                shutdown_conn = conn
            else:
                batch.append((conn, req))
                # drain already-queued requests into a pipelined batch
                srv.settimeout(window)
                while len(batch) < MAX_BATCH and shutdown_conn is None:
                    try:
                        c2, _ = srv.accept()
                    except socket.timeout:
                        break
                    r2 = _read_request(c2)
                    if r2 is None:
                        c2.close()
                    elif r2.get("op") == "shutdown":
                        shutdown_conn = c2
                    else:
                        batch.append((c2, r2))
            if batch:
                _serve_batch(batch)
            if shutdown_conn is not None:
                _respond(shutdown_conn, 0, "bye")
                return 0
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
