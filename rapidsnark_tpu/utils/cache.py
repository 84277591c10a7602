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

A COMMITTED seed cache (<repo>/.jax_cache_seed) holds the executables
for the CPU test/dryrun configurations: the C++ reference is AOT
compiled (zero compile at run time, main_prover.cpp:57-75); the
TPU-native analogue of shipping binaries is shipping the XLA
compilation-cache entries for the fixed test shapes. `enable()`
hardlinks seed entries into the active cache dir, so a fresh clone's
first test run / driver dryrun skips the multi-minute XLA:CPU pipeline
compiles.
"""

from __future__ import annotations

import os

_DONE = False
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
_DEFAULT = os.path.join(_REPO, ".jax_cache")
_SEED = os.path.join(_REPO, ".jax_cache_seed")


def _adopt_seed(path: str) -> None:
    """Hardlink (or copy) committed seed entries into the active cache."""
    if not os.path.isdir(_SEED) or os.path.abspath(path) == _SEED:
        return
    import shutil
    for name in os.listdir(_SEED):
        dst = os.path.join(path, name)
        if os.path.exists(dst):
            continue
        src = os.path.join(_SEED, name)
        try:
            os.link(src, dst)
        except OSError:
            try:
                shutil.copy2(src, dst)
            except OSError:
                pass


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
    _adopt_seed(path)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _DONE = True
