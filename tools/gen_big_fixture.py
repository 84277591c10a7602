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

import functools
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
# scalars per device chunk; bigger chunks amortize per-chunk host work
# and device launch overheads (RSTPU_GEN_CHUNK_BITS re-tunes)
_CH = 1 << int(os.environ.get("RSTPU_GEN_CHUNK_BITS", "18"))


def _ints_to_words_np(chunk):
    """List of ints -> (b, 8) u32 words via one bytes pass."""
    buf = b"".join(v.to_bytes(32, "little") for v in chunk)
    return np.frombuffer(buf, dtype="<u4").reshape(len(chunk), 8).copy()


def _limbs_to_plain(a):
    """(16, b) Montgomery limb array -> list of b plain ints."""
    from rapidsnark_tpu.utils.limbs import words_to_ints
    packed = np.ascontiguousarray((a[0::2] | (a[1::2] << 16)).T)  # (b, 8)
    return [FQ_CTX.from_mont(v) for v in words_to_ints(packed)]


# ---------------------------------------------------------------------------
# Device batch-affine conversion (the 2^24 enabler)
#
# Round-1 versions fetched projective coordinates and ran one python-int
# from_mont + inversion-share per point (~0.3 ms/pt, ~7 h for a 2^24
# table set). All of that moves on device: prefix/suffix Montgomery
# product passes give every z^-1 from ONE host inversion per chunk, the
# affine multiply and the 16-bit-pair word packing stay on device, and
# the host fetches only the final (b, k, 8) u32 word arrays — which are
# byte-identical to the zkey section payload (io/zkey.py layout).
# ---------------------------------------------------------------------------

@functools.cache
def _products_fn():
    """(16, 2, b) stacked [z, reversed(z)] -> inclusive prefix products
    along the last axis (ONE fori mul instantiation serves prefix AND
    suffix)."""
    import jax
    import jax.numpy as jnp
    from rapidsnark_tpu.ops.field import FQ

    @jax.jit
    def fn(z2):
        b = z2.shape[-1]
        steps = max((b - 1).bit_length(), 1)
        lane = jnp.arange(b)

        def body(i, x):
            sh = jnp.int32(1) << i
            rolled = jnp.roll(x, sh, axis=-1)
            prod = FQ.mul(x, rolled)
            return jnp.where((lane < sh)[None, None], x, prod)

        return jax.lax.fori_loop(0, steps, body, z2)

    return fn


@functools.cache
def _zsel_fn():
    import jax
    from rapidsnark_tpu.ops.field import FQ

    @jax.jit
    def fn(z):
        return FQ.select(FQ.is_zero(z), FQ.one_mont(z.shape[1:]), z)

    return fn


def _batch_zinv(z_sel):
    """z_sel: (16, b) nonzero Montgomery values. Returns (16, b) device
    Montgomery inverses via prefix x suffix products + one host pow."""
    import jax.numpy as jnp
    from rapidsnark_tpu.ops.field import FQ
    from rapidsnark_tpu.utils.limbs import int_to_limbs, limbs_to_int

    b = z_sel.shape[1]
    z2 = jnp.stack([z_sel, z_sel[:, ::-1]], axis=1)     # (16, 2, b)
    pp = _products_fn()(z2)
    pref, suf_r = pp[:, 0], pp[:, 1]
    total = limbs_to_int(np.asarray(pref[:, -1]))        # Montgomery int
    # inv in the Montgomery domain: want mont(v^-1) from mont(v)
    v = FQ_CTX.from_mont(total)
    inv_limbs = int_to_limbs(FQ_CTX.to_mont(pow(v, -1, P)))
    return _zinv_fn()(pref, suf_r, jnp.asarray(inv_limbs[:, None]))


@functools.cache
def _zinv_fn():
    import jax
    import jax.numpy as jnp
    from rapidsnark_tpu.ops.field import FQ

    @jax.jit
    def fn(pref, suf_r, inv_total):
        b = pref.shape[1]
        one = FQ.one_mont((b,))
        # P_{i-1} (1 at lane 0) and T_{i+1} (1 at lane b-1)
        pprev = jnp.where((jnp.arange(b) == 0)[None],
                          one, jnp.roll(pref, 1, axis=1))
        suf = suf_r[:, ::-1]                              # inclusive suffix
        tnext = jnp.where((jnp.arange(b) == b - 1)[None],
                          one, jnp.roll(suf, -1, axis=1))
        zi = FQ.mul(FQ.mul(pprev, tnext),
                    jnp.broadcast_to(inv_total, pref.shape))
        return zi

    return fn


@functools.cache
def _affine_pack_g1_fn():
    import jax
    import jax.numpy as jnp
    from rapidsnark_tpu.ops.field import FQ

    @jax.jit
    def fn(x, y, z, zinv):
        inf = FQ.is_zero(z)
        xa = FQ.select(inf, FQ.zero(x.shape[1:]), FQ.mul(x, zinv))
        ya = FQ.select(inf, FQ.zero(x.shape[1:]), FQ.mul(y, zinv))
        words = jnp.stack([xa, ya], axis=1)               # (16, 2, b)
        packed = words[0::2] | (words[1::2] << 16)        # (8, 2, b)
        return jnp.transpose(packed, (2, 1, 0))           # (b, 2, 8)

    return fn


@functools.cache
def _affine_pack_g2_fn():
    import jax
    import jax.numpy as jnp
    from rapidsnark_tpu.ops.field import FQ

    @jax.jit
    def fn(x0, x1, y0, y1, z0, z1, ninv):
        # zinv = conj(z) / norm(z); ninv = batch inverse of z0^2 + z1^2
        inf = FQ.is_zero(z0) & FQ.is_zero(z1)
        zi0 = FQ.mul(z0, ninv)
        zi1 = FQ.neg(FQ.mul(z1, ninv))
        zero = FQ.zero(x0.shape[1:])

        def fq2_mul(a0, a1, b0, b1):
            m0, m1, m2 = FQ.mul_many([(a0, b0), (a1, b1),
                                      (FQ.add_lazy(a0, a1),
                                       FQ.add_lazy(b0, b1))])
            return FQ.sub(m0, m1), FQ.sub(FQ.sub(m2, m0), m1)

        xa0, xa1 = fq2_mul(x0, x1, zi0, zi1)
        ya0, ya1 = fq2_mul(y0, y1, zi0, zi1)
        coords = [FQ.select(inf, zero, c) for c in (xa0, xa1, ya0, ya1)]
        words = jnp.stack(coords, axis=1)                 # (16, 4, b)
        packed = words[0::2] | (words[1::2] << 16)        # (8, 4, b)
        return jnp.transpose(packed, (2, 1, 0))           # (b, 4, 8)

    return fn


@functools.cache
def _g2_norm_fn():
    import jax
    from rapidsnark_tpu.ops.field import FQ

    @jax.jit
    def fn(z0, z1):
        inf = FQ.is_zero(z0) & FQ.is_zero(z1)
        m0, m1 = FQ.mul_many([(z0, z0), (z1, z1)])
        norm = FQ.add(m0, m1)
        return FQ.select(inf, FQ.one_mont(z0.shape[1:]), norm)

    return fn


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


def device_fixed_base_g1(scalars) -> np.ndarray:
    """[k]G1 for a list of plain ints, batched on device: 4-bit windowed
    fixed-base ladder + device batch-affine conversion. Returns
    (n, 2, 8) u32 Montgomery affine WORDS ((0,0) rows = infinity) — the
    zkey section payload layout (one host inversion per 2^17 chunk is
    the only per-chunk python math)."""
    import jax.numpy as jnp

    tx, ty = _g1_table_cached()
    fn = _g1_chunk_fn()
    pack = _affine_pack_g1_fn()

    out = []
    t0 = time.time()
    for lo in range(0, len(scalars), _CH):
        chunk = scalars[lo:lo + _CH]
        b = len(chunk)
        if b < _CH:  # pad: ONE compiled shape for every table/tail
            chunk = list(chunk) + [0] * (_CH - b)
        x, y, z = fn(jnp.asarray(_ints_to_words_np(chunk)), tx, ty)
        zinv = _batch_zinv(_zsel_fn()(z))
        out.append(np.asarray(pack(x, y, z, zinv))[:b])
        if os.environ.get("RSTPU_GEN_VERBOSE"):
            print(f"  g1 chunk {lo // _CH + 1}/"
                  f"{-(-len(scalars) // _CH)}: "
                  f"{time.time() - t0:.1f}s cum", flush=True)
    return np.concatenate(out, axis=0)


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


def _device_fixed_base_g2(scalars) -> np.ndarray:
    """[k]G2 word table, (n, 4, 8) u32 (x.c0 x.c1 y.c0 y.c1): fixed-base
    ladder + device Fq2 batch-affine (conj/norm with one Fq batch
    inverse of the norms per chunk)."""
    import jax.numpy as jnp

    tabs = _g2_window_table()
    fn = _g2_chunk_fn()
    pack = _affine_pack_g2_fn()

    out = []
    step = _CH // 2
    for lo in range(0, len(scalars), step):
        chunk = scalars[lo:lo + step]
        b = len(chunk)
        if b < step:
            chunk = list(chunk) + [0] * (step - b)
        (x0, x1), (y0, y1), (z0, z1) = fn(
            jnp.asarray(_ints_to_words_np(chunk)), *tabs)
        ninv = _batch_zinv(_g2_norm_fn()(z0, z1))
        out.append(np.asarray(pack(x0, x1, y0, y1, z0, z1, ninv))[:b])
    return np.concatenate(out, axis=0)


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
