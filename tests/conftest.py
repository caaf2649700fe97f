"""Test configuration.

Parity tests run on CPU in float64 so decisions match the reference's Python
float semantics exactly; sharding tests use 8 virtual CPU devices.  The
upstream reference (read-only at /root/reference) is imported as the test
oracle where present; tests that need it skip cleanly elsewhere.
"""

import os
import sys

# NB: this environment imports jax at interpreter startup (sitecustomize), so
# JAX_PLATFORMS from os.environ is already captured; jax.config.update is the
# only reliable override.  XLA_FLAGS is read lazily at CPU-client init, so the
# env var still works for the virtual device count.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the f64 CPU programs (bank pipelines, device
# codecs) cost seconds to tens of seconds each to compile and the suite
# compiles hundreds; the cache amortizes that to one compile per program
# shape across runs (keyed by backend, so it coexists with TPU entries).
from pymodem_tpu.runtime.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"
FIXTURE_WAV = os.path.join(REFERENCE_ROOT, "audio_samples/afsk_300_il2pc_noise.wav")

sys.dont_write_bytecode = True  # the reference mount is read-only


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "modems_codecs"))


@pytest.fixture(scope="session")
def reference():
    """Importable handle to the reference package (oracle)."""
    if not has_reference():
        pytest.skip("reference repo not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import modems_codecs  # noqa: F401

    return sys.modules["modems_codecs"]


@pytest.fixture(scope="session")
def fixture_audio():
    """The one bundled noisy WAV (8 kHz int16, 156.8 s)."""
    if not os.path.exists(FIXTURE_WAV):
        pytest.skip("fixture wav not available")
    from scipy.io import wavfile

    rate, audio = wavfile.read(FIXTURE_WAV)
    return rate, np.asarray(audio)


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_cache_maps():
    """Drop jit executable caches after each test module.

    Every compiled XLA:CPU executable holds multiple memory mappings; over
    the whole suite the process crosses the kernel's vm.max_map_count
    (65530) and the NEXT compile dies with SIGSEGV/SIGABRT inside
    backend_compile_and_load (observed at ~63k maps, deterministically in
    whichever module compiles next -- test_sharded at today's ordering).
    Clearing per module re-pays only cross-module shared compiles and keeps
    the mapping count bounded."""
    yield
    jax.clear_caches()


@pytest.fixture()
def rng(request):
    """Per-test deterministic generator.  (A session-scoped rng made test
    outcomes depend on which OTHER tests ran first -- running a subset
    shifted the draws and could flip draw-sensitive assertions.)"""
    import zlib

    return np.random.default_rng(
        zlib.crc32(request.node.nodeid.encode()) ^ 20260816
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running endurance tests (scale with "
        "PYMODEM_TPU_SOAK_SECONDS)"
    )
