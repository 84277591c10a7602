"""Production MSM configurations at CPU-testable scale.

Round-1 device tests pinned window_bits=4; the production paths — auto
window selection, window groups that do not divide the window count,
and the segmented (sliced point axis) scan used at 2^22+ — were only
exercised by TPU bench runs. These tests hit them on CPU with a
256-distinct-point tiled table so the python oracle stays cheap
(expected = sum over distinct bases of (sum of their scalars) * P).
"""

import random

import numpy as np

from rapidsnark_tpu.ops import msm as M
from rapidsnark_tpu.ops.curve import G1P
from rapidsnark_tpu.ref import curve as refc
from rapidsnark_tpu.ref.field import R_FR
from rapidsnark_tpu.utils import points as PT

from test_curve_jax import _host_g1p

rng = random.Random(77)

_NDISTINCT = 64


def _tiled_pts(n: int):
    base = []
    p = refc.G1_GEN
    for _ in range(_NDISTINCT):
        base.append(p)
        p = refc.G1.add(p, refc.G1_GEN)
    arr = np.stack([PT.g1_affine_to_mont_limbs(q) for q in base])
    reps = -(-n // _NDISTINCT)
    tiled = np.tile(arr, (reps, 1, 1))[:n]
    return base, M.prepare_g1(tiled)


def _expected(base, ks, n):
    sums = [0] * _NDISTINCT
    for i, k in enumerate(ks):
        sums[i % _NDISTINCT] = (sums[i % _NDISTINCT] + k) % R_FR
    return refc.G1.msm(base, sums)


def _run(n, c, window_group=4, segment=0):
    from rapidsnark_tpu.utils.limbs import ints_to_limbs

    base, pts = _tiled_pts(n)
    ks = [rng.randrange(R_FR) for _ in range(n)]
    sc = M.pad_scalars(ints_to_limbs(ks), M.pad_len(n))
    import jax
    out = jax.jit(lambda p, s: M.msm(G1P, p, s, c, window_group,
                                     segment=segment))(pts, sc)
    got = _host_g1p(out)
    assert refc.G1.eq(got, _expected(base, ks, n))


def test_auto_window_bits():
    """The production path never pins c: exercise best_window_bits'
    choice (c >= 8 at 2^12-scale, realistic digit/sort/bucket shapes)."""
    n = 1 << 12
    c = M.best_window_bits(n)
    assert c > 4, f"auto window surprisingly small: {c}"
    _run(n, c)


def test_window_count_not_divisible_by_group():
    """c=6 -> ceil(256/6)=43 windows (prime): the group size falls back
    through 4 -> 1 (msm's G_ reduction loop)."""
    nwin = -(-M.SCALAR_BITS // 6)
    assert all(nwin % g for g in (4, 3, 2)), "pick a c with prime nwin"
    _run(1 << 10, 6, window_group=4)


def test_segmented_scan_four_slices():
    """segment=256 over n=1024: four slices through the dynamic-slice
    scan path with cross-slice bucket accumulation (the 2^22+ HBM
    config, ops/msm.py `segment`)."""
    _run(1 << 10, 5, segment=256)


