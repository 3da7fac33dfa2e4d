"""Persistent XLA compilation cache helpers.

The driver host reaches its TPU through a remote tunnel where a cold jit
compile of a full-size model costs 1-6 minutes; a benchmark or dryrun
that recompiles everything blows the driver's time budget (BENCH_r04 was
killed at rc 124 with ~592 s of cold compiles in its tail). The fix —
proven by the multichip dryrun in round 4 — is an **in-repo, committed,
pre-warmed** cache directory: entries are warmed once on the target
backend and committed, so a fresh clone starts executing immediately.

``/tmp`` paths never survive into a driver run; anything that must be
warm across runs lives under the repo root.
"""

from __future__ import annotations

import os


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def setup_compile_cache(dirname: str = ".jax_bench_cache",
                        min_compile_secs: int = 1) -> str:
    """Point JAX's persistent compilation cache at an in-repo directory.

    ``JAX_CACHE_DIR`` overrides the location. Returns the path used
    (empty string when the running jax doesn't support the cache).
    Safe to call before or after backend initialization.
    """
    import jax

    path = os.environ.get("JAX_CACHE_DIR") or os.path.join(
        repo_root(), dirname)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:  # pragma: no cover - older jax
        return ""
    return path
