#!/usr/bin/env python3
"""Generate benchmark-scale sqchain fixtures (.zkey/.wtns) quickly.

The pure-Python setup (ref/setup.py) is exact but does one modular
inversion per domain element and one double-and-add per point — fine at
2^6, hopeless at 2^16+. This generator produces the SAME artifacts
(deterministic, seeded toxic waste) using:

  * Montgomery batch inversion on the host (1 inversion total per array),
  * the device batched scalar ladder (ops/curve.scalar_mul over 2^k
    lanes) for the fixed-base G1/G2 point tables,
  * vectorized numpy for byte packing.

Usage: python tools/gen_big_fixture.py [log2_steps] [outdir]
Writes sqchain<N>.zkey / sqchain<N>.wtns and pairing-verifies a proof
when --check is given (slow for big N: host pairing only).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from rapidsnark_tpu.utils import cache  # noqa: E402

cache.enable()

import numpy as np  # noqa: E402

from rapidsnark_tpu.ref.field import FR_CTX, FQ_CTX, R_FR, P, fr_w  # noqa: E402
from rapidsnark_tpu.ref import setup as S  # noqa: E402
from rapidsnark_tpu.ref.curve import G1_GEN, G2_GEN  # noqa: E402


def batch_inv(vals, mod):
    """Montgomery batch inversion: one pow(-1) for the whole list."""
    n = len(vals)
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * v % mod
    inv_all = pow(prefix[n], -1, mod)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % mod
        inv_all = inv_all * vals[i] % mod
    return out


def device_fixed_base_g1(scalars):
    """[k]G1 for a list of plain ints, batched on device. Returns a list
    of ref affine points (None = infinity)."""
    import jax.numpy as jnp
    from rapidsnark_tpu.ops.curve import G1
    from rapidsnark_tpu.utils.limbs import ints_to_limbs

    gx = FQ_CTX.to_mont(G1_GEN[0])
    gy = FQ_CTX.to_mont(G1_GEN[1])
    out = []
    CH = 1 << 14
    for lo in range(0, len(scalars), CH):
        chunk = scalars[lo:lo + CH]
        b = len(chunk)
        base = (jnp.broadcast_to(jnp.asarray(
                    ints_to_limbs([gx])[0])[:, None], (16, b)),
                jnp.broadcast_to(jnp.asarray(
                    ints_to_limbs([gy])[0])[:, None], (16, b)))
        jac = G1.scalar_mul(G1.from_affine(*base),
                            jnp.asarray(ints_to_limbs(chunk)))
        xs, ys, zs = [np.asarray(v) for v in jac]
        # batch the affine conversion: one inversion for the chunk
        zints = [sum(int(zs[j, i]) << (16 * j) for j in range(16))
                 for i in range(b)]
        zplain = [FQ_CTX.from_mont(z) for z in zints]
        nz = [(i, z) for i, z in enumerate(zplain) if z != 0]
        invs = batch_inv([z for _, z in nz], P)
        res = [None] * b
        for (i, _), zi in zip(nz, invs):
            x = FQ_CTX.from_mont(
                sum(int(xs[j, i]) << (16 * j) for j in range(16)))
            y = FQ_CTX.from_mont(
                sum(int(ys[j, i]) << (16 * j) for j in range(16)))
            z2 = zi * zi % P
            res[i] = (x * z2 % P, y * z2 % P * zi % P)
        out.extend(res)
    return out


def fast_setup(r1cs, seed="rapidsnark-tpu-test"):
    """ref.setup.setup with batched inversions + device point ladders.
    Produces identical output for the same seed (same formulas)."""
    from rapidsnark_tpu.ref.groth16 import ZKeyData
    from rapidsnark_tpu.ref.curve import G2

    tau, alpha, beta, gamma, delta = S._toxic(seed)
    n_constraints = len(r1cs.a_rows)
    domain = S._next_pow2(n_constraints + r1cs.n_public + 1)
    power = domain.bit_length() - 1
    w = fr_w(power)
    eta = fr_w(power + 1)

    a_rows = [dict(row) for row in r1cs.a_rows]
    b_rows = [dict(row) for row in r1cs.b_rows]
    c_rows = [dict(row) for row in r1cs.c_rows]
    for i in range(r1cs.n_public + 1):
        a_rows.append({i: 1})
        b_rows.append({})
        c_rows.append({})

    t0 = time.time()
    zt = (pow(tau, domain, R_FR) - 1) % R_FR
    assert zt != 0
    ninv = pow(domain, -1, R_FR)
    wks, wk = [], 1
    for _ in range(domain):
        wks.append(wk)
        wk = wk * w % R_FR
    denoms = [(tau - wk) % R_FR for wk in wks]
    dinvs = batch_inv(denoms, R_FR)
    lag = [zt * wks[k] % R_FR * dinvs[k] % R_FR * ninv % R_FR
           for k in range(domain)]

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
    kf = [(beta * a_at[s] + alpha * b_at[s] + c_at[s]) % R_FR
          for s in range(r1cs.n_vars)]

    # H scalars over the odd coset (ref/setup.py docstring)
    zt_plus = (pow(tau, domain, R_FR) + 1) % R_FR
    neg_half_r2 = (-pow(2, -1, R_FR) * FR_CTX.r2) % R_FR
    sigmas, sig = [], eta
    for _ in range(domain):
        sigmas.append(sig)
        sig = sig * w % R_FR
    hden = batch_inv([(-domain * (tau - s)) % R_FR for s in sigmas], R_FR)
    h_scal = [neg_half_r2 * (zt_plus * sigmas[k] % R_FR) % R_FR
              * hden[k] % R_FR * zt % R_FR * dinv % R_FR
              for k in range(domain)]
    print(f"scalars: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    points_a = device_fixed_base_g1(a_at)
    points_b1 = device_fixed_base_g1(b_at)
    ic_scal = [kf[s] * ginv % R_FR for s in range(r1cs.n_public + 1)]
    c_scal = [kf[s] * dinv % R_FR
              for s in range(r1cs.n_public + 1, r1cs.n_vars)]
    ic = device_fixed_base_g1(ic_scal)
    points_c = device_fixed_base_g1(c_scal)
    points_h = device_fixed_base_g1(h_scal)
    print(f"G1 tables: {time.time()-t0:.1f}s", flush=True)

    # G2 on the host would be slow; on device via the generic G2 ladder
    t0 = time.time()
    points_b2 = _device_fixed_base_g2(b_at)
    print(f"G2 table: {time.time()-t0:.1f}s", flush=True)

    coefs = []
    for k, row in enumerate(a_rows):
        for s, v in sorted(row.items()):
            coefs.append((0, k, s, FR_CTX.to_mont(v % R_FR)))
    for k, row in enumerate(b_rows):
        for s, v in sorted(row.items()):
            coefs.append((1, k, s, FR_CTX.to_mont(v % R_FR)))

    from rapidsnark_tpu.ref.curve import G1 as RG1
    return ZKeyData(
        n_vars=r1cs.n_vars, n_public=r1cs.n_public, domain_size=domain,
        coefs=coefs,
        vk_alpha1=RG1.mul(G1_GEN, alpha), vk_beta1=RG1.mul(G1_GEN, beta),
        vk_beta2=G2.mul(G2_GEN, beta), vk_gamma2=G2.mul(G2_GEN, gamma),
        vk_delta1=RG1.mul(G1_GEN, delta), vk_delta2=G2.mul(G2_GEN, delta),
        points_a=points_a, points_b1=points_b1, points_b2=points_b2,
        points_c=points_c, points_h=points_h, ic=ic,
    )


def _device_fixed_base_g2(scalars):
    import jax.numpy as jnp
    from rapidsnark_tpu.ops.curve import G2
    from rapidsnark_tpu.ref.field import fq2_inv, fq2_mul
    from rapidsnark_tpu.utils.limbs import ints_to_limbs

    (gx0, gx1), (gy0, gy1) = G2_GEN
    mont = FQ_CTX.to_mont
    out = []
    CH = 1 << 13
    for lo in range(0, len(scalars), CH):
        chunk = scalars[lo:lo + CH]
        b = len(chunk)

        def bc(v):
            return jnp.broadcast_to(
                jnp.asarray(ints_to_limbs([mont(v)])[0])[:, None], (16, b))

        base = G2.from_affine((bc(gx0), bc(gx1)), (bc(gy0), bc(gy1)))
        jac = G2.scalar_mul(base, jnp.asarray(ints_to_limbs(chunk)))
        (x0, x1), (y0, y1), (z0, z1) = [
            tuple(np.asarray(c) for c in coord) for coord in jac]

        def toint(a, i):
            return FQ_CTX.from_mont(
                sum(int(a[j, i]) << (16 * j) for j in range(16)))

        for i in range(b):
            zq = (toint(z0, i), toint(z1, i))
            if zq == (0, 0):
                out.append(None)
                continue
            xq = (toint(x0, i), toint(x1, i))
            yq = (toint(y0, i), toint(y1, i))
            zi = fq2_inv(zq)
            z2 = fq2_mul(zi, zi)
            out.append((fq2_mul(xq, z2), fq2_mul(yq, fq2_mul(z2, zi))))
    return out


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    outdir = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", "bench_fixtures")
    os.makedirs(outdir, exist_ok=True)
    steps = (1 << logn) - 2  # domain = next_pow2(steps + 2) = 2^logn

    from rapidsnark_tpu.io.wtns import write_wtns
    from rapidsnark_tpu.io.zkey import write_zkey

    t0 = time.time()
    zk = fast_setup(S.sqchain_r1cs(steps), seed=f"bench-{logn}")
    name = f"sqchain{1 << logn}"
    write_zkey(os.path.join(outdir, f"{name}.zkey"), zk)
    write_wtns(os.path.join(outdir, f"{name}.wtns"),
               S.sqchain_witness(steps, 3))
    print(f"{name}: setup+write {time.time()-t0:.1f}s "
          f"(domain 2^{logn}, nVars {zk.n_vars})", flush=True)


if __name__ == "__main__":
    main()
