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


def test_g2_iso_twist_constants():
    """The sextic rescaling behind G2P_ISO (ops/curve.py): u^6 = b'/b
    with b' = 1+9i, the generator lands on y^2 = x^3 + (1+9i), and the
    forward/backward constants are exact inverses."""
    from rapidsnark_tpu.ops.curve import G2P_ISO, _W2, _W3, _f2mul, _f2inv
    from rapidsnark_tpu.ref.field import P, FQ2_B

    def f2pow(a, e):
        r = (1, 0)
        while e:
            if e & 1:
                r = _f2mul(r, a)
            a = _f2mul(a, a)
            e >>= 1
        return r

    # w2^3 == w3^2 == u^6 == (1+9i)/b_twist
    ratio = _f2mul((1, 9), _f2inv(FQ2_B))
    assert f2pow(_W2, 3) == ratio == f2pow(_W3, 2)
    # generator maps onto the iso curve
    x, y = refc.G2_GEN
    xp, yp = _f2mul(_W2, x), _f2mul(_W3, y)
    lhs = _f2mul(yp, yp)
    rhs = _f2mul(_f2mul(xp, xp), xp)
    assert lhs == ((rhs[0] + 1) % P, (rhs[1] + 9) % P)
    assert G2P_ISO.b3_small == (3, 27)
    # Montgomery-encoded round trips
    R = 1 << 256
    for k, plain in (("w2", _W2), ("w3", _W3)):
        enc = G2P_ISO.iso[k]
        assert enc == (plain[0] * R % P, plain[1] * R % P)
        inv = G2P_ISO.iso[k + "i"]
        dec = (inv[0] * pow(R, -1, P) % P, inv[1] * pow(R, -1, P) % P)
        assert _f2mul(dec, plain) == (1, 0)


def test_g2_rescale_packed_matches_host():
    """g2_rescale_packed == host-int rescale on a mixed batch including
    the (0,0) infinity encoding (fixed by the map)."""
    import numpy as np
    from rapidsnark_tpu.ops.curve import _W2, _W3, _f2mul
    from rapidsnark_tpu.ref.field import P, FQ_CTX

    rng = random.Random(5)
    pts, exp = [], []
    base = refc.G2_GEN
    for i in range(7):
        if i == 3:
            aff = ((0, 0), (0, 0))  # infinity encoding
        else:
            aff = refc.G2.mul(base, rng.randrange(1, R_FR))
        pts.append(PT.g2_affine_to_mont_limbs(aff))
        exp.append((_f2mul(_W2, aff[0]), _f2mul(_W3, aff[1])))
    arr = np.stack(pts)
    out = M.prepare_g2(arr)  # rescales onto the iso twist
    # unpack device words back to ints
    def words_to_int(w):
        v = 0
        for j, word in enumerate(np.asarray(w, dtype=np.uint64)):
            v |= int(word) << (32 * j)
        return FQ_CTX.from_mont(v)
    for i in range(7):
        got_x = (words_to_int(out[0][0][:, i]), words_to_int(out[0][1][:, i]))
        got_y = (words_to_int(out[1][0][:, i]), words_to_int(out[1][1][:, i]))
        if i == 3:
            assert got_x == (0, 0) and got_y == (0, 0)
        else:
            assert (got_x, got_y) == exp[i]
