"""Test config: force JAX onto a virtual 8-device CPU mesh.

Multi-chip behavior is tested the TPU way without a pod: host-platform
device virtualization (SURVEY.md §4 consequence / §5.8). This must run
before the first `import jax` anywhere in the test session.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Persistent compilation cache (default <repo>/.jax_cache, RSTPU_CACHE
# overrides): the committed .jax_cache_seed entries are adopted by
# enable(), so a fresh clone's first test run skips the multi-minute
# XLA:CPU pipeline compiles; repeated shapes within one run hit the
# in-process cache either way.
from rapidsnark_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()

# The axon sitecustomize force-registers the TPU platform regardless of
# JAX_PLATFORMS; override at the config level before any device use.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
