"""Test configuration: force JAX onto a simulated 8-device CPU mesh.

Multi-chip sharding logic is exercised on virtual CPU devices so the
suite runs anywhere; benchmarks use the real TPU separately.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import jax
import pytest

# The axon sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS; override it explicitly so tests run on the CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the IN-PROCESS suite: disabled by
# default.  On this box the XLA:CPU AOT serializer is unreliable in a
# long-lived process (reproducible SIGSEGV inside
# put_executable_and_time/get_executable_and_time after ~650 tests,
# with matching "AOT result ... machine feature ... not supported on
# the host machine ... could lead to execution errors such as SIGILL"
# loader warnings); each test process compiles a program only once per
# session anyway, so the cache bought little here.  CLI subprocesses
# spawned BY tests still use the cache (app/cli._enable_compile_cache)
# — they are short-lived and were never implicated.  Set
# DUMPVDL2_TPU_TEST_CACHE=1 to re-enable for debugging.
if os.environ.get("DUMPVDL2_TPU_TEST_CACHE") == "1":
    try:
        _cache = os.path.join(os.path.expanduser("~"), ".cache",
                              "dumpvdl2_tpu", "xla")
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_WAV = pathlib.Path("/root/reference/test/vdl2_model_16b_1050kHz.wav")


@pytest.fixture(scope="session")
def reference_wav() -> pathlib.Path:
    if not REFERENCE_WAV.exists():
        pytest.skip("bundled reference capture not available")
    return REFERENCE_WAV
