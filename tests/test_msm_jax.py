"""Device Pippenger MSM vs the pure-Python ref oracle.

Covers the equivalent of ffiasm multiMulByScalar semantics used at
/root/reference/src/groth16.cpp:173-204: plain-LE-integer scalars,
(0,0)-encoded infinity points, zero scalars, duplicate points.
"""

import random

import numpy as np

from rapidsnark_tpu.ops import msm as M
from rapidsnark_tpu.ref import curve as refc
from rapidsnark_tpu.ref.field import R_FR
from rapidsnark_tpu.utils import points as PT
from rapidsnark_tpu.utils.limbs import ints_to_limbs

from test_curve_jax import _host_g1p, _host_g2p

rng = random.Random(7)


def _scalars(n):
    ks = [rng.randrange(R_FR) for _ in range(n)]
    ks[0] = 0                      # zero scalar lane
    if n > 3:
        ks[3] = 1                  # unit scalar
    return ks


def _g1_case(n):
    pts = [refc.G1.mul(refc.G1_GEN, rng.randrange(1, R_FR)) for _ in range(n)]
    if n > 2:
        pts[2] = None              # infinity point lane
    if n > 5:
        pts[5] = pts[4]            # duplicate point
    ks = _scalars(n)
    arr = np.stack([PT.g1_affine_to_mont_limbs(p) for p in pts])
    return pts, ks, arr


def _g2_case(n):
    pts = [refc.G2.mul(refc.G2_GEN, rng.randrange(1, R_FR)) for _ in range(n)]
    if n > 2:
        pts[2] = None
    ks = _scalars(n)
    arr = np.stack([PT.g2_affine_to_mont_limbs(p) for p in pts])
    return pts, ks, arr


def test_msm_g1_vs_ref():
    n = 21
    pts, ks, arr = _g1_case(n)
    dev_pts = M.prepare_g1(arr)
    sc = M.pad_scalars(ints_to_limbs(ks), M.pad_len(n))
    out = M.msm_g1(dev_pts, sc, 4)
    got = _host_g1p(out)
    expect = refc.G1.msm(pts, ks)
    assert refc.G1.eq(got, expect)


def test_msm_g1_tiny():
    # same (shape, c) as above -> shares the compiled executable
    pts, ks, arr = _g1_case(2)
    dev_pts = M.prepare_g1(arr)
    sc = M.pad_scalars(ints_to_limbs(ks), M.pad_len(2))
    got = _host_g1p(M.msm_g1(dev_pts, sc, 4))
    assert refc.G1.eq(got, refc.G1.msm(pts, ks))


def test_msm_g2_vs_ref():
    n = 9
    pts, ks, arr = _g2_case(n)
    dev_pts = M.prepare_g2(arr)
    sc = M.pad_scalars(ints_to_limbs(ks), M.pad_len(n))
    got = _host_g2p(M.msm_g2(dev_pts, sc, 4))
    expect = refc.G2.msm(pts, ks)
    assert refc.G2.eq(got, expect)


def test_window_digits_reconstruct():
    import jax.numpy as jnp
    ks = [rng.randrange(1 << 256) for _ in range(5)]
    packed = M.pad_scalars(ints_to_limbs(ks), len(ks))  # (n, 8) wire format
    for c in (4, 11, 16):
        d = np.asarray(M.window_digits(packed, c))
        for i, k in enumerate(ks):
            got = sum(int(d[w, i]) << (w * c) for w in range(d.shape[0]))
            assert got == k, f"c={c}"


def test_msm_segmented_matches_whole():
    # bucket accumulation across point-axis slices == one-shot scan
    import jax
    from rapidsnark_tpu.ops.curve import G1P
    n = 21
    pts, ks, arr = _g1_case(n)
    npad2 = 2 * M._CHUNK  # two slices
    arr2 = np.concatenate(
        [arr, np.zeros((npad2 - n, 2, 16), np.uint32)], axis=0)
    dev_pts = M.prepare_g1(arr2)
    sc = M.pad_scalars(ints_to_limbs(ks), npad2)
    whole = _host_g1p(jax.jit(
        lambda p, s: M.msm(G1P, p, s, 4, 4))(dev_pts, sc))
    seg = _host_g1p(jax.jit(
        lambda p, s: M.msm(G1P, p, s, 4, 4, segment=M._CHUNK)
    )(dev_pts, sc))
    expect = refc.G1.msm(pts, ks)
    assert refc.G1.eq(whole, expect)
    assert refc.G1.eq(seg, expect)


def test_signed_window_digits_reconstruct():
    # Fr-sized scalars (< 2^254): the signed recode's no-top-carry bound
    ks = [rng.randrange(R_FR) for _ in range(7)]
    ks[0] = 0
    ks[1] = R_FR - 1
    packed = M.pad_scalars(ints_to_limbs(ks), len(ks))
    for c in (4, 13, 16):
        enc = np.asarray(M.signed_window_digits(packed, c))
        half = 1 << (c - 1)
        for i, k in enumerate(ks):
            tot = 0
            for w in range(enc.shape[0]):
                e = int(enc[w, i])
                mag, neg = e >> 1, e & 1
                assert mag <= half
                tot += (-mag if neg else mag) << (w * c)
            assert tot == k, f"c={c}"
