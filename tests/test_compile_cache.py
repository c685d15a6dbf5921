"""Compile-cache lifecycle (VERDICT r4 item 4).

Covers the three rules in utils/compile_cache.py: backend-aware dir routing
(a CPU-only process must never write the TPU cache dir), bounded growth
(oldest-first prune + the jax LRU cap), and observability (cache_stats).
"""

import os
import subprocess
import sys
import time

from elevation_mapping_cupy_tpu.utils import compile_cache as cc


def _touch(path, size, mtime):
    with open(path, "wb") as f:
        f.write(b"x" * size)
    os.utime(path, (mtime, mtime))


def test_prune_removes_oldest_first(tmp_path):
    d = tmp_path / "cache"
    d.mkdir()
    now = time.time()
    _touch(d / "old", 600 * 1024, now - 300)
    _touch(d / "mid", 600 * 1024, now - 200)
    _touch(d / "new", 600 * 1024, now - 100)
    removed = cc.prune_cache_dir(str(d), max_mb=1)  # cap 1 MB -> keep newest
    assert removed == 2
    assert not (d / "old").exists() and not (d / "mid").exists()
    assert (d / "new").exists()
    # under cap: no-op
    assert cc.prune_cache_dir(str(d), max_mb=1) == 0


def test_prune_missing_dir_and_stats(tmp_path):
    assert cc.prune_cache_dir(str(tmp_path / "nope"), max_mb=1) == 0
    assert cc.cache_stats(str(tmp_path / "nope")) == {"entries": 0, "bytes": 0}
    d = tmp_path / "c"
    d.mkdir()
    _touch(d / "a", 100, time.time())
    s = cc.cache_stats(str(d))
    assert s["entries"] == 1 and s["bytes"] == 100


def test_backend_aware_dir_routing():
    assert cc.cache_dir_for_backend("tpu").endswith("/jax")
    assert cc.cache_dir_for_backend("cpu").endswith("/jax-cpu")
    # the harness's tunneled-TPU plugin alias (env JAX_PLATFORMS=axon, but
    # the registered platform is "tpu") must land in the TPU dir too
    assert cc.cache_dir_for_backend("axon").endswith("/jax")


def test_cpu_only_process_never_writes_tpu_cache_dir(tmp_path):
    """The r4 hazard verbatim: a CPU-only process with NO cache env vars set
    must route its AOT results to the per-backend cpu dir, leaving the TPU
    dir untouched (``__init__.py`` defers to ensure_compile_cache, which
    keys on the live backend)."""
    code = (
        "import os\n"
        "os.environ.pop('JAX_PLATFORMS', None)\n"
        "os.environ.pop('JAX_COMPILATION_CACHE_DIR', None)\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import elevation_mapping_cupy_tpu\n"
        "from elevation_mapping_cupy_tpu.utils.compile_cache import ("
        "ensure_compile_cache)\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)\n"
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)\n"
        "d = ensure_compile_cache()\n"
        "import jax.numpy as jnp\n"
        "jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64)))\n"
        "print('DIR=' + d)\n"
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "JAX_COMPILATION_CACHE_DIR")}
    env["ELEV_TPU_CACHE_ROOT"] = str(tmp_path)
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=300,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    d = [l for l in p.stdout.splitlines() if l.startswith("DIR=")][0][4:]
    assert d == str(tmp_path / "jax-cpu")
    assert not (tmp_path / "jax").exists(), "TPU cache dir must stay untouched"
    assert cc.cache_stats(d)["entries"] >= 1, "cpu cache should have been written"


def test_ensure_respects_existing_config():
    """First-writer wins: the conftest pins an isolated cpu-test cache dir;
    ensure_compile_cache must not reroute an already-configured process."""
    import jax

    before = jax.config.jax_compilation_cache_dir
    assert before and before.endswith("jax-cpu-tests")
    assert cc.ensure_compile_cache() == before
    assert jax.config.jax_compilation_cache_dir == before
