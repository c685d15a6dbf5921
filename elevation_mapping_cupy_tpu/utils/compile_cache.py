"""Persistent compile-cache lifecycle (VERDICT r4 item 4).

The Pallas/Mosaic kernels and the big nested-while raycast graphs compile in
minutes on tunneled TPU backends but are stable across runs, so the package
uses JAX's persistent compilation cache. Three lifecycle rules live here:

1. **Backend-aware routing** — the cache directory is chosen from the ACTUAL
   backend (``jax.default_backend()``), never from env sniffing: a CPU-only
   process with no env vars set must not write XLA:CPU AOT results into the
   TPU cache dir (the machine-feature-mismatch hazard — XLA:CPU AOT results
   embed compile-machine features and loading them on a different host warns
   "could lead to execution errors such as SIGILL", cpu_aot_loader.cc:210).
2. **Bounded growth** — both JAX's built-in LRU eviction
   (``jax_compilation_cache_max_size``) and an eager oldest-first prune at
   enable time cap each cache dir at ``ELEV_TPU_CACHE_MAX_MB`` (default
   2048 MB).
3. **Observability** — :func:`cache_stats` snapshots entry count / bytes so
   callers (bench.py) can report per-mode cache hits as
   ``entries_before == entries_after`` alongside their measured compile_s.

Reference analogue: the reference has no compile cache (CUDA kernels JIT in
milliseconds, elevation_mapping.py:228-282); this subsystem exists because
TPU toolchains put minutes-long AOT compilation on the critical path.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

__all__ = [
    "cache_dir_for_backend",
    "cache_stats",
    "ensure_compile_cache",
    "prune_cache_dir",
]

_CACHE_ROOT = os.path.expanduser(
    os.environ.get("ELEV_TPU_CACHE_ROOT", "~/.cache/elevation_mapping_tpu")
)


def _max_mb_default() -> int:
    return int(os.environ.get("ELEV_TPU_CACHE_MAX_MB", "2048"))


def cache_dir_for_backend(backend: str) -> str:
    """Per-backend cache dir: ``jax`` for TPU (the historical location the
    bench warms), ``jax-<backend>`` for everything else — so AOT artifacts
    compiled for one machine model can never be loaded by another.

    "axon" is this harness's tunneled-TPU plugin ALIAS (its env
    ``JAX_PLATFORMS=axon`` names the plugin, but the registered platform —
    ``jax.default_backend()`` — is "tpu"), so both spellings route to the
    TPU dir."""
    name = "jax" if backend in ("tpu", "axon") else f"jax-{backend}"
    return os.path.join(_CACHE_ROOT, name)


def prune_cache_dir(path: str, max_mb: Optional[int] = None) -> int:
    """Delete oldest-mtime cache entries until the dir holds <= max_mb.

    Returns the number of files removed. Missing dir is a no-op. This is the
    eager startup complement to JAX's own put-time LRU eviction
    (jax_compilation_cache_max_size): it also shrinks caches written by
    OLDER package versions that never set the cap.
    """
    if max_mb is None:
        max_mb = _max_mb_default()
    if max_mb <= 0 or not os.path.isdir(path):
        return 0
    entries = []
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            try:
                st = os.stat(p)
            except OSError:
                continue
            entries.append((st.st_mtime, st.st_size, p))
            total += st.st_size
    cap = max_mb * (1 << 20)
    removed = 0
    for mtime, size, p in sorted(entries):
        if total <= cap:
            break
        try:
            os.remove(p)
            total -= size
            removed += 1
        except OSError:
            pass
    return removed


def cache_stats(path: str) -> Dict[str, int]:
    """{"entries": N, "bytes": B} for a cache dir (zeros if missing)."""
    n = b = 0
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    b += os.stat(os.path.join(root, f)).st_size
                except OSError:
                    continue
                n += 1
    return {"entries": n, "bytes": b}


def ensure_compile_cache(
    backend: Optional[str] = None, max_mb: Optional[int] = None
) -> str:
    """Enable the persistent compilation cache for the live backend.

    Initializes the backend if needed (callers on latency-sensitive import
    paths should call this from their entry point, not at module import).
    Explicit routing wins: an env ``JAX_COMPILATION_CACHE_DIR`` or an
    already-configured ``jax_compilation_cache_dir`` (e.g. the test
    conftest's isolated dir) is left untouched. Returns the directory in
    effect.
    """
    import jax

    explicit = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if explicit:
        return explicit
    if max_mb is None:
        max_mb = _max_mb_default()
    try:
        current = jax.config.jax_compilation_cache_dir
        if current:
            return current
        if backend is None:
            backend = jax.default_backend()
        path = cache_dir_for_backend(backend)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # very old jax without these options: degrade to no-cache
        return cache_dir_for_backend(backend or "unknown")
    try:
        # newer-jax-only LRU cap: its absence must not disable the dir
        # routing above or the eager prune below
        if max_mb > 0:
            jax.config.update("jax_compilation_cache_max_size", max_mb << 20)
    except Exception:
        pass
    prune_cache_dir(path, max_mb)
    return path
