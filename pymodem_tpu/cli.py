"""Command-line driver: ``python -m pymodem_tpu <config.json> <audio.wav>``.

Same interface and exit codes as the reference driver (pymodem.py:5-9,25-49).
Set PYMODEM_TPU_X64=1 to run the DSP in float64 (bit-parity mode on CPU);
the default on TPU is float32.
"""

from __future__ import annotations

import os
import sys
import time


def main(argv=None) -> int:
    argv = list(sys.argv if argv is None else argv)
    if len(argv) != 3:
        print("Not enough arguments. Usage: python3 -m pymodem_tpu "
              "<config json> <sound file>")
        return 2

    # Warm-pool routing: a persistent decode server (pymodem_tpu/serve.py)
    # keeps compiled bank programs loaded across invocations -- on a
    # tunneled TPU the one-shot CLI otherwise pays ~30-40 s of program
    # load per bank per process.  The client path never imports jax.
    server = os.environ.get("PYMODEM_TPU_SERVER", "")
    if server:
        if os.path.exists(server):
            from .serve import client_request

            code, output = client_request(server, argv[1], argv[2])
            sys.stdout.write(output)
            return code
        print(f"decode server socket not found: {server}", file=sys.stderr)

    return run_decode(argv[1], argv[2])


def _setup_runtime() -> str:
    """Apply the env-driven jax config; return the runtime name."""
    import jax

    platform = os.environ.get("PYMODEM_TPU_PLATFORM", "")
    if os.environ.get("PYMODEM_TPU_X64", "0") not in ("0", "", "false"):
        # float64 parity mode: TPUs have no native f64, so run on host CPU.
        jax.config.update("jax_enable_x64", True)
        platform = platform or "cpu"
    if platform:
        # JAX_PLATFORMS may be captured at interpreter startup (see
        # tests/conftest.py); config.update is the reliable override.
        jax.config.update("jax_platforms", platform)

    from .runtime.cache import enable_compilation_cache

    enable_compilation_cache()

    runtime = os.environ.get("PYMODEM_TPU_RUNTIME", "auto")
    if runtime == "auto":
        # banked block-parallel programs on accelerators; the sequential
        # reference-parity path for f64/CPU runs
        runtime = "sequential" if jax.config.jax_enable_x64 else "banked"
    return runtime


def run_decode_many(config_path: str, wav_paths: list[str]) -> list[tuple[int, str]]:
    """Pipelined decode of several requests sharing one config."""
    return run_decode_batch([(config_path, w) for w in wav_paths])


def run_decode_batch(requests: list[tuple[str, str]]) -> list[tuple[int, str]]:
    """Pipelined decode of queued (config, wav) requests -- the serve.py
    batch path.  On the banked runtime every request's device programs
    dispatch before earlier requests' readbacks
    (bank.run_plans_banked_pipelined), so queued requests hide each
    other's readback/report round trips EVEN ACROSS DIFFERENT configs
    (same-config batching used to be required).  Returns (exit code,
    captured output) per request, output identical to run_decode.
    Non-banked runtimes (and validation failures) fall back per request.
    """
    import contextlib
    import io

    def _one(config, wav):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            code = run_decode(config, wav)
        return code, buf.getvalue()

    runtime = _setup_runtime()
    if runtime != "banked" or len(requests) == 1:
        return [_one(c, w) for c, w in requests]

    import json

    from .config import load_plan
    from .runtime.bank import run_plans_banked_pipelined
    from .wav_io import read_wav

    outputs: list[tuple[int, str] | None] = [None] * len(requests)
    cfg_ok: dict[str, bool] = {}
    plans: dict[tuple[str, float], object] = {}
    jobs: list[tuple[int, object, object, float]] = []
    for i, (config, wav) in enumerate(requests):
        if config not in cfg_ok:
            try:
                with open(config) as fh:
                    for raw in fh:
                        if raw.strip():
                            json.loads(raw)
                cfg_ok[config] = True
            except Exception:
                cfg_ok[config] = False
        if not cfg_ok[config]:
            outputs[i] = (3, "Unable to open config json file.\n")
            continue
        try:
            rate, audio = read_wav(wav)
        except Exception:
            outputs[i] = (4, "Unable to open audio file.\n")
            continue
        key = (config, rate)
        if key not in plans:
            try:
                plans[key] = load_plan(config, rate)
            except Exception as exc:
                plans[key] = (3, f"Unable to open config json file. ({exc})\n")
        plan = plans[key]
        if isinstance(plan, tuple):
            outputs[i] = plan
            continue
        jobs.append((i, plan, audio, rate))
    if jobs:
        start = time.time()
        diag = io.StringIO()
        try:
            # resilience diagnostics ("banked runtime failed ...",
            # "skipped chain ...") belong to the CLIENTS, not the server
            # console -- but a batch-wide capture cannot attribute them to
            # the request that produced them, so ANY diagnostic (like any
            # exception) degrades the batch to one-at-a-time runs, where
            # _one scopes each job's output correctly
            with contextlib.redirect_stdout(diag):
                results = run_plans_banked_pipelined(
                    [(p, a, r) for _i, p, a, r in jobs], depth=1
                )
            if diag.getvalue():
                results = None
        except Exception:  # resilient contract: retry one at a time
            results = None
        if results is None:
            for i, _p, _a, _r in jobs:
                outputs[i] = _one(*requests[i])
        else:
            # the batch decodes jointly, so per-request wall time is the
            # per-request average of the pipelined run
            elapsed = round((time.time() - start) / len(jobs), 2)
            for (i, plan, _a, _r), result in zip(jobs, results):
                # diag is empty on this path (non-empty degraded above)
                out = [f"Built {len(plan.chains)} demod chains\n",
                       f"banked runtime: {len(plan.chains)} chains\n"]
                for report_spec, text in zip(plan.reports, result.reports):
                    out.append(f"Generating {report_spec.name}\n")
                    out.append(text + "\n")
                out.append(f"Elapsed time: {elapsed} seconds.\n")
                outputs[i] = (0, "".join(out))
    return [o if o is not None else (1, "internal error\n") for o in outputs]


def run_decode(config_path: str, wav_path: str) -> int:
    """The decode body: validate inputs, run the plan, print reports.

    Shared by the one-shot CLI and the persistent server."""
    argv = [None, config_path, wav_path]

    import jax

    runtime = _setup_runtime()

    from .config import load_plan
    from .wav_io import read_wav

    if runtime == "banked":
        from .runtime.bank import run_plan_banked as run_plan
    else:
        from .runtime.executor import run_plan

    # The reference validates the config BEFORE the audio (pymodem.py:35-46),
    # so exit 3 wins when both are bad.  Chain construction needs the WAV's
    # sample rate, so syntax-check the JSONL here and build chains after.
    import json

    try:
        with open(argv[1]) as fh:
            for raw in fh:
                if raw.strip():
                    json.loads(raw)
    except Exception:
        print("Unable to open config json file.")
        return 3
    try:
        sample_rate, audio = read_wav(argv[2])
    except Exception:
        print("Unable to open audio file.")
        return 4
    try:
        plan = load_plan(argv[1], sample_rate)
    except Exception as exc:
        print(f"Unable to open config json file. ({exc})")
        return 3

    profile = os.environ.get("PYMODEM_TPU_PROFILE", "")
    if profile:
        from . import profiling

        profiling.enable()

    print(f"Built {len(plan.chains)} demod chains")
    start = time.time()
    if profile and profile not in ("1", "true", "yes"):
        from . import profiling

        with profiling.trace(profile):
            result = run_plan(plan, audio, sample_rate, verbose=True)
    else:
        result = run_plan(plan, audio, sample_rate, verbose=True)
    for report_spec, text in zip(plan.reports, result.reports):
        print(f"Generating {report_spec.name}")
        print(text)
    if profile:
        from . import profiling

        print(profiling.report())
    print(f"Elapsed time: {round(time.time() - start, 2)} seconds.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
