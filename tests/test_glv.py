"""GLV endomorphism decomposition (ops/glv.py) vs host oracles.

Checks (1) the endomorphism constants against the pure-Python curve
oracle (phi(P) = lam*P on both groups), (2) the device Babai
decomposition bit-exactly against the Python-int oracle including
adversarial scalars, and (3) MSM results with GLV on == GLV off ==
the ref MSM, for G1 and G2, segmented and not.
"""

import random

import numpy as np
import jax.numpy as jnp

from rapidsnark_tpu.ops import glv as G
from rapidsnark_tpu.ops import msm as M
from rapidsnark_tpu.ref import curve as refc
from rapidsnark_tpu.ref import field as rf
from rapidsnark_tpu.ref.field import R_FR
from rapidsnark_tpu.utils import points as PT
from rapidsnark_tpu.utils.limbs import ints_to_limbs

from test_curve_jax import _host_g1p, _host_g2p
from test_msm_jax import _g1_case, _g2_case

rng = random.Random(31)

EDGE = [0, 1, 2, R_FR - 1, G.LAM_G1, R_FR - G.LAM_G1, G.LAM_G2,
        (1 << 128), (1 << 253), R_FR // 2, G.LAM_G1 - 1, G.LAM_G1 + 1]


def test_phi_is_lam_mul_g1():
    for k in (1, 7, rng.randrange(R_FR)):
        p = refc.G1.mul(refc.G1_GEN, k)
        phi = (G.BETA_G1 * p[0] % rf.P, p[1])
        assert refc.G1.is_on_curve(phi)
        assert refc.G1.eq(phi, refc.G1.mul(p, G.LAM_G1))


def test_phi_is_lam_mul_g2():
    for k in (1, 9, rng.randrange(R_FR)):
        p = refc.G2.mul(refc.G2_GEN, k)
        phi = (rf.fq2_scalar(p[0], G.BETA_G2), p[1])
        assert refc.G2.is_on_curve(phi)
        assert refc.G2.eq(phi, refc.G2.mul(p, G.LAM_G2))


def test_bounds_and_reconstruction_host():
    for params in (G.G1_PARAMS, G.G2_PARAMS):
        assert params.bound < (1 << 127)
        for k in EDGE + [rng.randrange(R_FR) for _ in range(200)]:
            a1, n1, a2, n2 = params.decompose_host(k)  # self-asserts


def test_decompose_device_matches_host():
    for params in (G.G1_PARAMS, G.G2_PARAMS):
        ks = EDGE + [rng.randrange(R_FR) for _ in range(52)]
        n = len(ks)
        sc = jnp.asarray(M.pad_scalars(ints_to_limbs(ks), n))
        dec, neg = G.decompose(params, sc)   # (4, 2n) words-leading
        dec = np.asarray(dec)
        neg = np.asarray(neg)
        for i, k in enumerate(ks):
            a1, s1, a2, s2 = params.decompose_host(k)
            for j, (a, s) in enumerate(((a1, s1), (a2, s2))):
                row = dec[:, j * n + i]
                got = sum(int(w) << (32 * t) for t, w in enumerate(row))
                assert got == a, (i, j, k)
                assert int(neg[j * n + i]) == s, (i, j, k)


def _msm_both(curve_tag, n, c, segment=0):
    if curve_tag == "g1":
        pts, ks, arr = _g1_case(n)
        dev = M.prepare_g1(arr)
        host = refc.G1.msm(pts, ks)
        run = lambda glv: M.msm(M.G1P, dev, sc, c, combine=True,
                                segment=segment, glv=glv)
        back, eq = _host_g1p, refc.G1.eq
    else:
        pts, ks, arr = _g2_case(n)
        dev = M.prepare_g2(arr)
        host = refc.G2.msm(pts, ks)
        run = lambda glv: M.msm(M.G2P, dev, sc, c, combine=True,
                                segment=segment, glv=glv)
        back, eq = _host_g2p, refc.G2.eq
    sc = M.pad_scalars(ints_to_limbs(ks), M.pad_len(n))
    on = back(run(True))
    off = back(run(False))
    assert eq(on, host)
    assert eq(off, host)


def test_decompose_chunked_matches():
    import os
    ks = [rng.randrange(R_FR) for _ in range(64)]
    sc = jnp.asarray(M.pad_scalars(ints_to_limbs(ks), 64))
    ref_d, ref_n = G.decompose(G.G1_PARAMS, sc)
    os.environ["RSTPU_GLV_CHUNK"] = "16"
    try:
        got_d, got_n = G.decompose(G.G1_PARAMS, sc)
    finally:
        del os.environ["RSTPU_GLV_CHUNK"]
    assert np.array_equal(np.asarray(ref_d), np.asarray(got_d))
    assert np.array_equal(np.asarray(ref_n), np.asarray(got_n))
    # batched rows chunk too (the prover's 2- and 4-row batches)
    sc2 = jnp.stack([sc, sc[::-1]])
    ref2 = G.decompose(G.G1_PARAMS, sc2)
    os.environ["RSTPU_GLV_CHUNK"] = "16"
    try:
        got2 = G.decompose(G.G1_PARAMS, sc2)
    finally:
        del os.environ["RSTPU_GLV_CHUNK"]
    for a, b in zip(ref2, got2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_msm_glv_g1():
    _msm_both("g1", 21, 4)


def test_msm_glv_g2():
    _msm_both("g2", 9, 4)


def test_msm_glv_g1_segmented():
    # pad_len(300) = 512 -> 1024 GLV entries over 4 segment slices,
    # exercising the traced upper-half phi flag
    _msm_both("g1", 300, 5, segment=256)


def test_prover_blocked_g1_tables():
    """RSTPU_G1_BLOCKS=1 forces the 2^23+ blocked G1 layout (two
    [H,A]/[B1,C] lax.map blocks, prover.py _msm_stage) at test scale;
    the proof must be byte-identical to the standard 4-row batch."""
    import os
    from rapidsnark_tpu.io.wtns import read_wtns
    from rapidsnark_tpu.io.zkey import read_zkey
    from rapidsnark_tpu.prover import Prover

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "sqchain64")
    wit = read_wtns(fix + ".wtns").values

    def prove(blocked):
        os.environ["RSTPU_G1_BLOCKS"] = "1" if blocked else "0"
        try:
            zkey = read_zkey(fix + ".zkey")
            p = Prover(zkey, window_bits=4)
            zkey.close()
            proof, pub = p.prove(wit, r=1234567, s=7654321)
        finally:
            del os.environ["RSTPU_G1_BLOCKS"]
        return proof.to_json_dict(), pub

    pj_b, pub_b = prove(True)
    pj_s, pub_s = prove(False)
    assert pj_b == pj_s and pub_b == pub_s
