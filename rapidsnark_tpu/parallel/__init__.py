"""Multi-chip / multi-host distribution (SURVEY.md §5.7-§5.8).

The reference is a single-node OpenMP program with no distributed
backend; scaling the big dimension (domainSize / nVars) across a TPU
mesh is this framework's replacement for that gap: MSM points shard
across devices with per-device Pippenger partials combined by an
all-gather + group-law tree reduction, and the coefficient scatter
reduces with integer psum. See pmsm.py; the mesh axis is named "shard".
"""

from .pmsm import msm_sharded, point_spec, scalar_spec  # noqa: F401
