#!/usr/bin/env python3
"""Build the committed XLA compile-cache seed (.jax_cache_seed).

The C++ reference ships AOT-compiled binaries (zero compile at run
time); the TPU-native analogue for the FIXED test/dryrun shapes is
shipping the XLA persistent-cache entries so a fresh clone's first
`pytest tests/` and the driver's `dryrun_multichip` skip the
multi-minute XLA:CPU pipeline compiles (rapidsnark_tpu/utils/cache.py
adopts the seed by hardlink).

Runs, each against a FRESH seed dir:
  1. the full CPU test suite (8 virtual devices),
  2. the driver gates: entry() jit + dryrun_multichip(8).

Usage: python tools/build_cache_seed.py  (takes ~15 min on one core)
"""

import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEED = os.path.join(ROOT, ".jax_cache_seed")


def main():
    if os.path.isdir(SEED):
        shutil.rmtree(SEED)
    os.makedirs(SEED)

    env = dict(os.environ)
    env["RSTPU_CACHE"] = SEED
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)

    print("== pytest (cold, writing seed) ==", flush=True)
    rc = subprocess.call(
        [sys.executable, "-m", "pytest", "tests/", "-x", "-q"],
        cwd=ROOT, env=env)
    if rc:
        sys.exit(rc)

    print("== driver gates (entry + dryrun_multichip) ==", flush=True)
    genv = dict(env)
    genv["JAX_PLATFORMS"] = "cpu"
    genv["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    rc = subprocess.call([sys.executable, "__graft_entry__.py"],
                         cwd=ROOT, env=genv)
    if rc:
        sys.exit(rc)

    n = len(os.listdir(SEED))
    size = sum(os.path.getsize(os.path.join(SEED, f))
               for f in os.listdir(SEED))
    print(f"seed: {n} entries, {size / 1e6:.0f} MB", flush=True)


if __name__ == "__main__":
    main()
