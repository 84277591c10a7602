"""Groth16 trusted setup for test circuits (INSECURE, deterministic).

Builds `ZKeyData` for an R1CS, with the exact point conventions a
snarkjs-generated zkey carries, so fixtures written from this setup are
indistinguishable from real snarkjs artifacts to the prover:

  * domainSize = next power of two >= nConstraints + nPublic + 1, and the
    A-matrix gets one extra row per public signal binding wire i at
    domain row nConstraints + i (snarkjs zkey_new convention — keeps the
    public part of the witness bound to the proof).
  * section-9 H points are
        H_i = [ -(R^2 / 2) * Lhat_i(tau) * (tau^N - 1) / delta ] * G1
    where Lhat_i is the Lagrange basis over the *odd* 2N-th roots domain
    sigma_i = w_{2N}^(2i+1). Derivation: the reference prover hands the
    MSM scalars d_i * R^-2 where d_i = (A*B-C)(sigma_i) = -2 * H(sigma_i)
    (see groth16.cpp:157-173 and SURVEY.md §3.1 — the stored a/b carry
    plain values, mont_mul leaves R^-1, fromMontgomery another R^-1), so
    the points must absorb the factor -(R^2)/2 for
    MSM(points_h, scalars) == [H(tau) * Z(tau) / delta] * G1.

All toxic waste is derived deterministically from a seed. Test use only.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Dict, List, Tuple

from .curve import G1, G2, G1_GEN, G2_GEN
from .field import FR_CTX, R_FR, fr_w
from .groth16 import ZKeyData


@dataclass
class R1CS:
    """Constraint system: rows of sparse {wire: value} maps.

    Wire 0 is the constant one; wires 1..nPublic are public signals.
    """
    n_vars: int
    n_public: int
    a_rows: List[Dict[int, int]]
    b_rows: List[Dict[int, int]]
    c_rows: List[Dict[int, int]]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _toxic(seed: str) -> Tuple[int, int, int, int, int]:
    vals = []
    for name in ("tau", "alpha", "beta", "gamma", "delta"):
        h = hashlib.sha256(f"{seed}:{name}".encode()).digest()
        v = int.from_bytes(h, "little") % R_FR
        vals.append(v if v != 0 else 1)
    return tuple(vals)


def setup(r1cs: R1CS, seed: str = "rapidsnark-tpu-test") -> ZKeyData:
    tau, alpha, beta, gamma, delta = _toxic(seed)
    n_constraints = len(r1cs.a_rows)
    domain = _next_pow2(n_constraints + r1cs.n_public + 1)
    power = domain.bit_length() - 1
    w = fr_w(power)
    eta = fr_w(power + 1)  # w_{2N}; eta^2 == w

    # Extended A matrix: public-input binding rows.
    a_rows = [dict(row) for row in r1cs.a_rows]
    b_rows = [dict(row) for row in r1cs.b_rows]
    c_rows = [dict(row) for row in r1cs.c_rows]
    for i in range(r1cs.n_public + 1):
        a_rows.append({i: 1})
        b_rows.append({})
        c_rows.append({})

    # Lagrange values over H at tau: L_k(tau) = (tau^N - 1) w^k / (N (tau - w^k))
    zt = (pow(tau, domain, R_FR) - 1) % R_FR
    assert zt != 0, "tau fell inside the domain; change seed"
    ninv = pow(domain, -1, R_FR)
    lag = []
    wk = 1
    for _ in range(domain):
        lag.append(zt * wk % R_FR * pow((tau - wk) % R_FR, -1, R_FR) % R_FR * ninv % R_FR)
        wk = wk * w % R_FR

    # Per-wire polynomial evaluations at tau.
    a_at = [0] * r1cs.n_vars
    b_at = [0] * r1cs.n_vars
    c_at = [0] * r1cs.n_vars
    for k, row in enumerate(a_rows):
        for s, v in row.items():
            a_at[s] = (a_at[s] + v * lag[k]) % R_FR
    for k, row in enumerate(b_rows):
        for s, v in row.items():
            b_at[s] = (b_at[s] + v * lag[k]) % R_FR
    for k, row in enumerate(c_rows):
        for s, v in row.items():
            c_at[s] = (c_at[s] + v * lag[k]) % R_FR

    ginv = pow(gamma, -1, R_FR)
    dinv = pow(delta, -1, R_FR)

    points_a = [G1.mul(G1_GEN, a_at[s]) for s in range(r1cs.n_vars)]
    points_b1 = [G1.mul(G1_GEN, b_at[s]) for s in range(r1cs.n_vars)]
    points_b2 = [G2.mul(G2_GEN, b_at[s]) for s in range(r1cs.n_vars)]

    def kfactor(s: int) -> int:
        return (beta * a_at[s] + alpha * b_at[s] + c_at[s]) % R_FR

    ic = [G1.mul(G1_GEN, kfactor(s) * ginv % R_FR)
          for s in range(r1cs.n_public + 1)]
    points_c = [G1.mul(G1_GEN, kfactor(s) * dinv % R_FR)
                for s in range(r1cs.n_public + 1, r1cs.n_vars)]

    # Section-9 H points over the odd coset (see module docstring).
    # Lhat_i(tau) = (tau^N + 1) * sigma_i / (-N * (tau - sigma_i))
    # H_i = -(R^2/2) * Lhat_i(tau) * (tau^N - 1) / delta
    zt_plus = (pow(tau, domain, R_FR) + 1) % R_FR
    neg_half_r2 = (-pow(2, -1, R_FR) * FR_CTX.r2) % R_FR
    points_h = []
    sigma = eta
    for _ in range(domain):
        lhat = (zt_plus * sigma % R_FR
                * pow((-domain * (tau - sigma)) % R_FR, -1, R_FR) % R_FR)
        scal = neg_half_r2 * lhat % R_FR * zt % R_FR * dinv % R_FR
        points_h.append(G1.mul(G1_GEN, scal))
        sigma = sigma * w % R_FR

    # Coefficient records (zkey section 4): Montgomery-form values.
    coefs = []
    for k, row in enumerate(a_rows):
        for s, v in sorted(row.items()):
            coefs.append((0, k, s, FR_CTX.to_mont(v % R_FR)))
    for k, row in enumerate(b_rows):
        for s, v in sorted(row.items()):
            coefs.append((1, k, s, FR_CTX.to_mont(v % R_FR)))

    return ZKeyData(
        n_vars=r1cs.n_vars,
        n_public=r1cs.n_public,
        domain_size=domain,
        coefs=coefs,
        vk_alpha1=G1.mul(G1_GEN, alpha),
        vk_beta1=G1.mul(G1_GEN, beta),
        vk_beta2=G2.mul(G2_GEN, beta),
        vk_gamma2=G2.mul(G2_GEN, gamma),
        vk_delta1=G1.mul(G1_GEN, delta),
        vk_delta2=G2.mul(G2_GEN, delta),
        points_a=points_a,
        points_b1=points_b1,
        points_b2=points_b2,
        points_c=points_c,
        points_h=points_h,
        ic=ic,
    )


# ---------------------------------------------------------------------------
# Test circuits
# ---------------------------------------------------------------------------

def multiplier_r1cs() -> R1CS:
    """out = a * b. Wires: [one, out(pub), a, b]."""
    return R1CS(
        n_vars=4, n_public=1,
        a_rows=[{2: 1}],
        b_rows=[{3: 1}],
        c_rows=[{1: 1}],
    )


def multiplier_witness(a: int, b: int) -> List[int]:
    return [1, a * b % R_FR, a % R_FR, b % R_FR]


def sqchain_r1cs(n_steps: int) -> R1CS:
    """x_{k+1} = x_k^2 + k chain; out = x_n public, x_0 private input.

    One constraint per step: x_k * x_k = x_{k+1} - k.
    Wires: [one, out(pub), x_0, x_1, ..., x_{n-1}] (x_n is the out wire).
    Scales to arbitrary power-of-two domains for benchmarks.
    """
    def wire(k: int) -> int:
        return 1 if k == n_steps else 2 + k

    a_rows, b_rows, c_rows = [], [], []
    for k in range(n_steps):
        a_rows.append({wire(k): 1})
        b_rows.append({wire(k): 1})
        c_rows.append({wire(k + 1): 1, 0: (-k) % R_FR})
    return R1CS(n_vars=n_steps + 2, n_public=1,
                a_rows=a_rows, b_rows=b_rows, c_rows=c_rows)


def sqchain_witness(n_steps: int, x0: int) -> List[int]:
    xs = [x0 % R_FR]
    for k in range(n_steps):
        xs.append((xs[-1] * xs[-1] + k) % R_FR)
    return [1, xs[n_steps]] + xs[:n_steps]
