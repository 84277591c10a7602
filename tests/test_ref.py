"""Golden-model self-consistency: fields, curves, pairing, Groth16.

The pure-Python ref stack is the oracle for everything else, so it gets
its own adversarial tests (bilinearity, negative cases, NTT inverses).
"""

import random

from rapidsnark_tpu.ref import field as F
from rapidsnark_tpu.ref import ntt as refntt
from rapidsnark_tpu.ref.curve import G1, G2, G12, G1_GEN, G2_GEN
from rapidsnark_tpu.ref.field import Fq12, P, R_FR, fr_w
from rapidsnark_tpu.ref.groth16 import prove, verify
from rapidsnark_tpu.ref.pairing import (cast_g1, pairing,
                                        pairing_product_is_one, twist)
from rapidsnark_tpu.ref import setup as S

rng = random.Random(42)


def test_fr_root_chain():
    for power in (1, 2, 10, 28):
        w = fr_w(power)
        assert pow(w, 1 << power, R_FR) == 1
        assert pow(w, 1 << (power - 1), R_FR) == R_FR - 1  # primitive


def test_fq2_field_axioms():
    for _ in range(20):
        a = (rng.randrange(P), rng.randrange(P))
        b = (rng.randrange(P), rng.randrange(P))
        assert F.fq2_mul(a, F.fq2_inv(a)) == F.FQ2_ONE
        ab = F.fq2_mul(a, b)
        ba = F.fq2_mul(b, a)
        assert F.fq2_eq(ab, ba)


def test_fq12_inverse_and_pow():
    for _ in range(5):
        a = Fq12([rng.randrange(P) for _ in range(12)])
        assert (a * a.inv()).is_one()
    x = Fq12([rng.randrange(P) for _ in range(12)])
    assert x ** (P ** 2) == (x ** P) ** P


def test_curve_groups():
    assert G1.is_on_curve(G1_GEN)
    assert G2.is_on_curve(G2_GEN)
    assert G12.is_on_curve(twist(G2_GEN))
    assert G12.is_on_curve(cast_g1(G1_GEN))
    assert G1.mul(G1_GEN, R_FR) is None
    assert G2.mul(G2_GEN, R_FR) is None
    # add/double consistency
    p2 = G1.double(G1_GEN)
    assert G1.eq(G1.add(G1_GEN, G1_GEN), p2)
    assert G1.eq(G1.mul(G1_GEN, 5),
                 G1.add(p2, G1.add(p2, G1_GEN)))
    assert G1.add(G1_GEN, G1.neg(G1_GEN)) is None


def test_msm_matches_sum():
    pts = [G1.mul(G1_GEN, rng.randrange(1, 1000)) for _ in range(8)]
    scalars = [rng.randrange(R_FR) for _ in range(8)]
    acc = None
    for p, s in zip(pts, scalars):
        acc = G1.add(acc, G1.mul(p, s))
    assert G1.eq(G1.msm(pts, scalars), acc)


def test_pairing_bilinear():
    e = pairing(G2_GEN, G1_GEN)
    assert not e.is_one()
    assert e * e == pairing(G2_GEN, G1.mul(G1_GEN, 2))
    assert e * e == pairing(G2.mul(G2_GEN, 2), G1_GEN)
    assert pairing_product_is_one(
        [(G1.mul(G1_GEN, 2), G2_GEN), (G1.neg(G1_GEN), G2.mul(G2_GEN, 2))])


def test_ref_ntt_roundtrip_and_dft():
    n = 8
    a = [rng.randrange(R_FR) for _ in range(n)]
    fa = refntt.fft(a)
    w = fr_w(3)
    for i in range(n):
        expect = sum(a[k] * pow(w, i * k, R_FR) for k in range(n)) % R_FR
        assert fa[i] == expect
    assert refntt.ifft(fa) == a


def test_groth16_end_to_end_multiplier():
    zk = S.setup(S.multiplier_r1cs())
    w = S.multiplier_witness(3, 5)
    proof = prove(zk, w, r=12345, s=67890)
    assert verify(zk, proof, [15])
    assert not verify(zk, proof, [16])


def test_groth16_proof_is_randomized_but_valid():
    zk = S.setup(S.multiplier_r1cs())
    w = S.multiplier_witness(7, 11)
    p1 = prove(zk, w, r=1, s=2)
    p2 = prove(zk, w, r=3, s=4)
    assert p1.a != p2.a
    assert verify(zk, p1, [77]) and verify(zk, p2, [77])


def test_groth16_sqchain():
    n = 16
    zk = S.setup(S.sqchain_r1cs(n))
    w = S.sqchain_witness(n, 3)
    proof = prove(zk, w)
    assert verify(zk, proof, w[1:2])
