"""Groth16 prove (byte-level executable spec) and verify, pure Python.

`prove` mirrors the reference pipeline /root/reference/src/groth16.cpp:49-254
EXACTLY at the level of stored integer values, including every Montgomery
representation quirk documented in SURVEY.md §3.1:

  * witness values are standard-form integers (wtns convention),
  * zkey coefficients/points are Montgomery-form (R = 2^256),
  * `E.fr.mul` is a Montgomery product, so the a/b arrays carry plain
    values while c = mont_mul(a, b) carries an extra R^-1,
  * the H scalars get one more `fromMontgomery` (groth16.cpp:162), so the
    MSM consumes h * R^-2 — the zkey's section-9 points absorb R^2,
  * r/s are 31 random bytes, never reduced (groth16.cpp:209-217),
  * rs = toMontgomery(mont_mul(r, s)) = r*s mod r_mod (groth16.cpp:241-242).

The TPU prover must produce bit-identical proofs given the same (r, s).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Sequence, Tuple

from .curve import G1, G2
from .field import FR_CTX, R_FR, fr_w
from .ntt import fft, ifft
from . import pairing


@dataclass
class Proof:
    """Groth16 proof; A, C in G1 (affine int pairs), B in G2."""
    a: Tuple[int, int]
    b: Tuple[Tuple[int, int], Tuple[int, int]]
    c: Tuple[int, int]

    def to_json_dict(self) -> Dict:
        """Matches Proof::toJson (/root/reference/src/groth16.cpp:268-301)."""
        return {
            "pi_a": [str(self.a[0]), str(self.a[1]), "1"],
            "pi_b": [
                [str(self.b[0][0]), str(self.b[0][1])],
                [str(self.b[1][0]), str(self.b[1][1])],
                ["1", "0"],
            ],
            "pi_c": [str(self.c[0]), str(self.c[1]), "1"],
            "protocol": "groth16",
        }


@dataclass
class ZKeyData:
    """Parsed zkey contents as plain Python values.

    Group elements are affine tuples in *standard* (non-Montgomery) form;
    coefficient values stay Montgomery (they are consumed by mont_mul,
    exactly as the reference keeps them raw, SURVEY.md §1 last bullet).
    """
    n_vars: int
    n_public: int
    domain_size: int
    # (m, c, s, coef_montgomery_int) records, zkey section 4
    coefs: List[Tuple[int, int, int, int]]
    vk_alpha1: Tuple[int, int]
    vk_beta1: Tuple[int, int]
    vk_beta2: Tuple
    vk_gamma2: Tuple
    vk_delta1: Tuple[int, int]
    vk_delta2: Tuple
    points_a: List  # nVars G1
    points_b1: List  # nVars G1
    points_b2: List  # nVars G2
    points_c: List  # nVars - nPublic - 1 G1 (wires nPublic+1 .. nVars-1)
    points_h: List  # domainSize G1
    ic: List = dc_field(default_factory=list)  # nPublic + 1 G1 (vkey)


def sample_rs() -> int:
    """31 random bytes, top byte zero — groth16.cpp:209-217 convention."""
    return int.from_bytes(os.urandom(31), "little")


def prove(zkey: ZKeyData, witness: Sequence[int],
          r: Optional[int] = None, s: Optional[int] = None) -> Proof:
    n = zkey.domain_size
    mm = FR_CTX.mul

    if r is None:
        r = sample_rs()
    if s is None:
        s = sample_rs()

    # --- witness -> a/b evaluations (groth16.cpp:52-85) --------------------
    a = [0] * n
    b = [0] * n
    for (m, c, sidx, coef) in zkey.coefs:
        tgt = a if m == 0 else b
        tgt[c] = (tgt[c] + mm(witness[sidx], coef)) % R_FR

    # --- c = a (*) b pointwise (groth16.cpp:89-96) --------------------------
    cvec = [mm(a[i], b[i]) for i in range(n)]

    # --- coset FFTs (groth16.cpp:99-155) ------------------------------------
    # ifft -> multiply element k by eta^k (eta = w_{2N}) -> fft
    eta = fr_w(n.bit_length())  # domainPower + 1
    def to_odd_coset(v):
        v = ifft(v)
        v = [v[k] * pow(eta, k, R_FR) % R_FR for k in range(n)]
        return fft(v)

    a = to_odd_coset(a)
    b = to_odd_coset(b)
    cvec = to_odd_coset(cvec)

    # --- h scalars (groth16.cpp:157-166): (a*b - c) then fromMontgomery ----
    h = [FR_CTX.from_mont((mm(a[i], b[i]) - cvec[i]) % R_FR) for i in range(n)]

    # --- the 5 MSMs (groth16.cpp:169-205) -----------------------------------
    pih = G1.msm(zkey.points_h, h)
    pi_a = G1.msm(zkey.points_a, witness[: zkey.n_vars])
    pib1 = G1.msm(zkey.points_b1, witness[: zkey.n_vars])
    pi_b = G2.msm(zkey.points_b2, witness[: zkey.n_vars])
    pi_c = G1.msm(zkey.points_c, witness[zkey.n_public + 1: zkey.n_vars])

    # --- randomized assembly (groth16.cpp:209-246) --------------------------
    pi_a = G1.add(pi_a, zkey.vk_alpha1)
    pi_a = G1.add(pi_a, G1.mul(zkey.vk_delta1, r))

    pi_b = G2.add(pi_b, zkey.vk_beta2)
    pi_b = G2.add(pi_b, G2.mul(zkey.vk_delta2, s))

    pib1 = G1.add(pib1, zkey.vk_beta1)
    pib1 = G1.add(pib1, G1.mul(zkey.vk_delta1, s))

    pi_c = G1.add(pi_c, pih)
    pi_c = G1.add(pi_c, G1.mul(pi_a, s))
    pi_c = G1.add(pi_c, G1.mul(pib1, r))
    rs = r * s % R_FR  # = toMontgomery(mont_mul(r, s))
    pi_c = G1.add(pi_c, G1.neg(G1.mul(zkey.vk_delta1, rs)))

    assert pi_a is not None and pi_b is not None and pi_c is not None
    return Proof(a=pi_a, b=pi_b, c=pi_c)


def verify(zkey: ZKeyData, proof: Proof, publics: Sequence[int]) -> bool:
    """Groth16 verification: e(A,B) = e(alpha,beta) e(vk_x,gamma) e(C,delta).

    This is the snarkjs-oracle role (SURVEY.md §4). `publics` are the
    public signal values (witness[1..nPublic]).
    """
    assert len(publics) == zkey.n_public
    vk_x = zkey.ic[0]
    for i, val in enumerate(publics):
        vk_x = G1.add(vk_x, G1.mul(zkey.ic[i + 1], val))
    return pairing.pairing_product_is_one([
        (G1.neg(proof.a), proof.b),
        (zkey.vk_alpha1, zkey.vk_beta2),
        (vk_x, zkey.vk_gamma2),
        (proof.c, zkey.vk_delta2),
    ])
