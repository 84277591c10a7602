"""Persistent XLA compilation cache setup.

The prover's kernels (complete-adder MSM scans, NTT stages) produce large
HLO graphs whose first compile is expensive (tens of seconds per MSM
shape). The reference has no analogous cost (C++ AOT); the TPU-native
equivalent of "compile once" is JAX's persistent compilation cache, keyed
by HLO fingerprint, so every CLI invocation / server start / test session
after the first reuses compiled executables.

Call `enable()` before the first jit execution. Controlled by
RSTPU_CACHE (path; "0" disables). Default: <repo>/.jax_cache — one shared
cache for tests, CLI, server, and bench.
"""

from __future__ import annotations

import os

_DONE = False
_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(
        __file__)))), ".jax_cache")


def enable(path: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax
    # Honor JAX_PLATFORMS at the config level: some environments install
    # a sitecustomize that force-registers an experimental TPU platform
    # regardless of the env var; the config update wins.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    env = os.environ.get("RSTPU_CACHE")
    if env == "0":
        return
    path = path or env or _DEFAULT
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _DONE = True
