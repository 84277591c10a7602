"""Runtime configuration (aux subsystem §5.6 — the reference has NO
config system: pure argv + compile-time constants, SURVEY.md §5.6; this
replaces its hardcoded knobs with env-var-backed settings).

    RSTPU_WINDOW_BITS    Pippenger window size c (default: auto by n)
    RSTPU_WINDOW_GROUP   windows batched per MSM scan step (default 4)
    RSTPU_MSM_SEGMENT    points per MSM bucket-accumulation slice
                         (default: auto — caps the prefix-scan working
                         set for 2^22+ tables; 0 disables)
    RSTPU_CACHE          compilation cache dir ("0" disables)
    RSTPU_LOG_LEVEL      error|info|trace|debug
    RSTPU_LOG_FILE       log sink path (default console)
"""

from __future__ import annotations

import os
from typing import Optional


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def window_bits() -> Optional[int]:
    return _int_env("RSTPU_WINDOW_BITS")


def window_group(n: int = 0) -> int:
    """Windows batched per MSM scan step. The scan's all-positions
    prefix output is ~192 B per (point, window-in-group, msm-row):
    shrinking the group at big domains cuts that footprint linearly
    while total scan/sort/gather work stays ∝ nwin (G only sets how
    the window passes are batched) — which lets the SEGMENT grow and
    the per-slice extraction count drop (msm_segment below)."""
    v = _int_env("RSTPU_WINDOW_GROUP")
    if v is not None:
        return v
    return 5  # measured optimum at every size incl. 2^24 (round 5:
    # G=5 108.4 s vs G=2 122.7 s on the msms phase — stage paging
    # removed the HBM motive for the old big-domain G=2 rule)


def ntt_sequential(power: int) -> bool:
    """Transform a/b/c one at a time (1/3 the NTT stage temporaries).
    Default: domains of 2^23+ (HBM pressure next to the point tables);
    RSTPU_NTT_SEQ=1/0 overrides."""
    v = os.environ.get("RSTPU_NTT_SEQ")
    if v is not None:
        return v != "0"
    return power >= 23


def msm_segment(n: int) -> int:
    """Bucket-accumulation slice length for an n-point MSM (0 = whole).

    The scan's all-positions prefix output is ~192 bytes per
    (point, window-in-group, msm-row); past 2^21 points the un-sliced
    working set crowds HBM next to the resident tables."""
    v = _int_env("RSTPU_MSM_SEGMENT")
    if v is not None:
        return v
    # the within-array is ~192*G*rows bytes per point (window_group
    # above shrinks G to 2 at 2^23+). At the 2^24 ceiling even the
    # G=2/2^20 combination OOMed next to the ~12 GB of resident
    # tables + scalar-row stack (measured round 4): 2^19 halves the
    # scan set there; 2^22/2^23 keep the bigger slice.
    if n >= (1 << 24):
        return 1 << 19
    return (1 << 20) if n > (1 << 21) else 0


def g1_blocked(nmax: int) -> bool:
    """Store the 4 G1 tables as two (8, 2, nmax) blocks ([H,A], [B1,C])
    and run the G1 MSM as a 2-iteration lax.map: at 2^23+ the 4-row
    batch's scan working set + scalar buffers do not fit HBM next to
    the resident tables, and a per-prove reshape of the (8, 4, nmax)
    layout would copy all 4 GB. RSTPU_G1_BLOCKS=1/0 overrides."""
    v = os.environ.get("RSTPU_G1_BLOCKS")
    if v is not None:
        return v != "0"
    return nmax >= (1 << 23)
