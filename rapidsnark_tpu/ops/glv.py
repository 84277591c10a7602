"""GLV endomorphism scalar decomposition for BN254 G1 and G2 (device).

Halves the number of Pippenger window passes (SURVEY.md §3.1 hot loop;
reference multiexp: depends/ffiasm multiexp.cpp via groth16.cpp:173-204
— the reference does NOT use GLV; this is a TPU-motivated algorithmic
upgrade: in the sort+scan formulation the per-window bucket-extraction
cost is fixed per window, so halving windows at constant total scan
work removes ~half the extraction time, the dominant term at 2^18).

Math. BN254 G1 has the cube-root endomorphism phi(x, y) = (beta*x, y)
with phi(P) = lam*P (lam^2 + lam + 1 = 0 mod r). The twist G2 admits
the same SHAPE of map (x, y) -> (beta*x, y) with beta the OTHER Fq cube
root, acting as its own primitive root lam' (verified against the host
oracle in tests/test_glv.py) — so one implementation serves both groups
and the map commutes with the G2 iso-twist rescaling (both are diagonal
coordinate scalings).

A scalar k < r splits as k = k1 + k2*lam (mod r) with |ki| <= ~2^126:
Babai round-off against a Gauss-reduced basis of the lattice
L = {(a, b) : a + b*lam = 0 mod r}, computed at import time from
(r, 0), (-lam, 1). Then

    k*P = k1*P + k2*phi(P)

i.e. an n-point 254-bit MSM becomes a 2n-point 128-bit MSM: windows
drop from ceil(254/c) to ceil(128/c). Signs of ki fold into the signed
digit encoding (ops/msm.py) by XOR-ing bit 0, never touching points.

Device decomposition: the rounding products k*g_i (g_i = the basis
fixed-point inverses scaled by 2^S, S = 272) run as 16-bit-limb
convolutions in uint32 — exact, branch-free, ~0.2% of one window scan.
The worst-case |ki| bound is computed EXACTLY at import and asserted
against the top-window no-carry-out condition for every c <= 16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ref.field import P as _P, R_FR as _R

MASK = 0xFFFF

# MSM digit coverage for decomposed scalars: |ki| < 2^127 plus the
# signed-recode carry fits 128 bits for every window size (asserted
# per-params below).
GLV_BITS = 128

# primitive cube roots (derivation: tools/../tests/test_glv.py checks
# phi(G) == lam*G against the host oracle for both groups)
BETA_G1 = 2203960485148121921418603742825762020974279258880205651966
LAM_G1 = 4407920970296243842393367215006156084916469457145843978461
BETA_G2 = BETA_G1            # same x-scaling acts as the OTHER root on
LAM_G2 = _R - 1 - LAM_G1     # the twist (sum of roots = -1 mod r)


def _gauss_reduce(lam: int):
    """Shortest basis of {(a, b): a + b*lam = 0 mod r} (Gauss/Lagrange)."""
    v1, v2 = (_R, 0), (-lam, 1)

    def n2(v):
        return v[0] * v[0] + v[1] * v[1]

    if n2(v1) < n2(v2):
        v1, v2 = v2, v1
    while True:
        d = v1[0] * v2[0] + v1[1] * v2[1]
        m = ((2 * d + n2(v2)) // (2 * n2(v2)) if d >= 0
             else -((-2 * d + n2(v2)) // (2 * n2(v2))))
        v1 = (v1[0] - m * v2[0], v1[1] - m * v2[1])
        if n2(v1) >= n2(v2):
            break
        v1, v2 = v2, v1
    return v2, v1


_S = 272  # fixed-point shift of the Babai rounding constants (17 limbs)


class GLVParams:
    """Per-group decomposition constants (pure Python ints; baked into
    the traced graph as limb immediates)."""

    def __init__(self, lam: int, beta: int):
        self.lam = lam
        self.beta = beta
        self.beta_mont = beta * (1 << 256) % _P
        v1, v2 = _gauss_reduce(lam)
        det = v1[0] * v2[1] - v1[1] * v2[0]
        assert abs(det) == _R
        assert (v1[0] + v1[1] * lam) % _R == 0
        assert (v2[0] + v2[1] * lam) % _R == 0
        self.v1, self.v2 = v1, v2
        # c1 = round(k*b2/det), c2 = round(-k*b1/det); k >= 0, so the
        # SIGN of each c_i is compile-time constant — fold it into the
        # k_i update constants and keep magnitudes on device.
        num1, num2 = v2[1], -v1[1]
        self.s1 = 1 if num1 * det > 0 else -1
        self.s2 = 1 if num2 * det > 0 else -1
        self.g1 = (abs(num1) << _S) // abs(det)
        self.g2 = (abs(num2) << _S) // abs(det)
        # k1 = k - c1*a1 - c2*a2 = k + c1m*(-s1*a1) + c2m*(-s2*a2)
        # k2 =   - c1*b1 - c2*b2 =     c1m*(-s1*b1) + c2m*(-s2*b2)
        # (mod 2^176, two's complement; c_im = |c_i| on device)
        M176 = 1 << 176
        self.t1a = (-self.s1 * v1[0]) % M176
        self.t2a = (-self.s2 * v2[0]) % M176
        self.t1b = (-self.s1 * v1[1]) % M176
        self.t2b = (-self.s2 * v2[1]) % M176
        # exact worst-case bound: ki = (beta_i - c_i) <dot> basis with
        # |beta_i - c_i| <= 1/2 + 2^-(S-254-lg|g|) (floor + half-ulp)
        slack_num, slack_den = 1 << (_S - 1), 1 << _S  # 1/2
        eps_num, eps_den = 1 << 254, 1 << _S           # k*1ulp error
        bnds = []
        for comp in (0, 1):                            # k1 / k2 bounds
            m = abs(v1[comp]) + abs(v2[comp])
            bnds.append((m * slack_num * eps_den + m * eps_num * slack_den)
                        // (slack_den * eps_den) + 1)
        self.bound = max(bnds)
        assert self.bound < (1 << 127)  # |ki| fits 4 packed u32 words
        # top-window no-carry-out for every window size c at GLV_BITS:
        # nwin*c total bits, top digit (|ki| >> (nwin-1)*c) + 1 < 2^(c-1)
        for c in range(2, 17):
            nwin = -(-GLV_BITS // c)
            assert (self.bound >> ((nwin - 1) * c)) + 1 < (1 << (c - 1)), c

    def decompose_host(self, k: int):
        """Python-int oracle of the device decomposition (tests)."""
        c1 = (k * self.g1 + (1 << (_S - 1))) >> _S
        c2 = (k * self.g2 + (1 << (_S - 1))) >> _S
        M176 = 1 << 176
        k1 = (k + c1 * self.t1a + c2 * self.t2a) % M176
        k2 = (c1 * self.t1b + c2 * self.t2b) % M176
        out = []
        for v in (k1, k2):
            neg = (v >> 175) & 1
            out.append(((M176 - v) if neg else v, neg))
        (a1, n1), (a2, n2) = out
        assert a1 <= self.bound and a2 <= self.bound
        assert ((-a1 if n1 else a1) + (-a2 if n2 else a2) * self.lam
                - k) % _R == 0
        return a1, n1, a2, n2


G1_PARAMS = GLVParams(LAM_G1, BETA_G1)
G2_PARAMS = GLVParams(LAM_G2, BETA_G2)


def params_for(curve) -> GLVParams:
    from .curve import Fq2Ops
    return G2_PARAMS if isinstance(curve.f, Fq2Ops) else G1_PARAMS


@functools.cache
def enabled() -> bool:
    import os
    return os.environ.get("RSTPU_GLV", "1") != "0"


# ---------------------------------------------------------------------------
# 16-bit-limb multiprecision helpers ((L, *batch) uint32 arrays)
# ---------------------------------------------------------------------------

def _const_limbs(v: int, nl: int):
    return [(v >> (16 * i)) & MASK for i in range(nl)]


def _mul_const(a, const: int, out_limbs: int, extra_add: int = 0):
    """(a * const + extra_add) mod 2^(16*out_limbs) as 16-bit limbs.

    a: (La, *b) uint32 16-bit limbs. Column sums stay exact in uint32:
    La lo-halves + La hi-halves + one extra limb + carry < 2^22."""
    La = a.shape[0]
    ncl = max(1, (const.bit_length() + 15) // 16)
    cl = _const_limbs(const, ncl)
    el = _const_limbs(extra_add, out_limbs)
    cols = [None] * out_limbs
    for i in range(La):
        ai = a[i]
        for j in range(min(ncl, out_limbs - i)):
            if cl[j] == 0:
                continue
            p = ai * jnp.uint32(cl[j])
            lo, hi = p & jnp.uint32(MASK), p >> 16
            c = i + j
            cols[c] = lo if cols[c] is None else cols[c] + lo
            if c + 1 < out_limbs:
                cols[c + 1] = hi if cols[c + 1] is None else cols[c + 1] + hi
    zero = jnp.zeros_like(a[0])
    out, carry = [], None
    for c in range(out_limbs):
        t = cols[c] if cols[c] is not None else zero
        if el[c]:
            t = t + jnp.uint32(el[c])
        if carry is not None:
            t = t + carry
        out.append(t & jnp.uint32(MASK))
        carry = t >> 16
    return jnp.stack(out)


def _add3_mod(x, y, z, nl: int):
    """(x + y + z) mod 2^(16*nl), all (nl, *b) 16-bit limbs."""
    s = x + y + z
    out, carry = [], None
    for c in range(nl):
        t = s[c] if carry is None else s[c] + carry
        out.append(t & jnp.uint32(MASK))
        carry = t >> 16
    return jnp.stack(out)


def _abs_tc(x, nl: int):
    """Two's-complement magnitude + sign of (nl, *b) limbs mod 2^(16*nl)
    (values guaranteed in (-2^(16*nl-1), 2^(16*nl-1)))."""
    neg = (x[nl - 1] >> 15) & 1
    inv = (jnp.uint32(MASK) ^ x)
    out, carry = [], jnp.uint32(1)
    for c in range(nl):
        t = inv[c] + carry
        out.append(t & jnp.uint32(MASK))
        carry = t >> 16
    mag = jnp.where(neg[None].astype(bool), jnp.stack(out), x)
    return mag, neg


def decompose(params: GLVParams, scalars: jnp.ndarray):
    """(*b, n, 8) packed u32 256-bit scalars (< r) ->
    (scalars2 (5, *b, 2n): packed |ki| halves laid out [k1-block |
     k2-block] on the entry axis, WORD AXIS LEADING (|ki| < 2^127 fits
     4 words; leading-word/minor-n is the TPU-tileable layout) plus ONE
     trailing ZERO word row — the pad ops/msm's straddling 2-word
     digit slices need, emitted here per chunk so the MSM never
     materializes a second full-size padded copy (1.3 GB at 2^24),
     neg (*b, 2n) uint32 0/1 per-entry sign).

    Entry i of the 2n-row maps to table point i mod n (second block =
    phi-image). All arithmetic exact in uint32 16-bit limb columns.
    2^22+ rows run chunked under lax.map: the 26-limb rounding products
    would otherwise hold ~170 B/lane of temporaries (GBs at 2^24)."""
    import os
    ch = int(os.environ.get("RSTPU_GLV_CHUNK", 1 << 21))
    n = scalars.shape[-2]
    if n > ch and n % ch == 0:
        bsh = scalars.shape[:-2]
        nb = len(bsh)
        xs = jnp.moveaxis(scalars.reshape(bsh + (n // ch, ch, 8)), -3, 0)
        kc, negc = jax.lax.map(lambda s: _decompose_core(params, s), xs)
        # per-chunk entry layout [k1-chunk | k2-chunk] (last axis) ->
        # global [k1 | k2]; the word axis stays LEADING throughout
        def glue(a, lead):
            # a: (nch, *lead, *b, 2ch) -> (*lead, *b, 2n)
            parts = [jnp.moveaxis(a[..., i * ch:(i + 1) * ch], 0, lead + nb)
                     for i in (0, 1)]
            shp = a.shape[1:1 + lead] + bsh + (n,)
            return jnp.concatenate([p.reshape(shp) for p in parts], axis=-1)
        return glue(kc, 1), glue(negc, 0)
    return _decompose_core(params, scalars)


def _decompose_core(params: GLVParams, scalars: jnp.ndarray):
    from .msm import unpack_limb_rows
    k = unpack_limb_rows(jnp.moveaxis(scalars, -1, 0))   # (16, *b, n)

    outs = []
    for g, ta, tb in ((params.g1, params.t1a, params.t1b),
                      (params.g2, params.t2a, params.t2b)):
        # c_im = (k*g + 2^(S-1)) >> S; S = 272 = 17 limbs, product < 2^400
        full = _mul_const(k, g, 26, extra_add=1 << (_S - 1))
        outs.append(full[17:26])                         # (9, *b, n)
    c1m, c2m = outs

    k11 = k[:11]
    m1a = _mul_const(c1m, params.t1a, 11)
    m2a = _mul_const(c2m, params.t2a, 11)
    k1 = _add3_mod(k11, m1a, m2a, 11)
    m1b = _mul_const(c1m, params.t1b, 11)
    m2b = _mul_const(c2m, params.t2b, 11)
    k2 = _add3_mod(jnp.zeros_like(k11), m1b, m2b, 11)

    packed, negs = [], []
    for kk in (k1, k2):
        mag, neg = _abs_tc(kk, 11)
        # word axis LEADING, n minor: (5, *b, n) tiles clean on TPU (a
        # trailing word axis would lane-pad 5 -> 128, a 32x HBM blowup
        # on any materializing copy at 2^24); row 4 is the zero pad
        rows = [mag[2 * j] | (mag[2 * j + 1] << 16) for j in range(4)]
        rows.append(jnp.zeros_like(rows[0]))
        packed.append(jnp.stack(rows))
        negs.append(neg)
    return (jnp.concatenate(packed, axis=-1),   # (5, *b, 2n)
            jnp.concatenate(negs, axis=-1))     # (*b, 2n)
