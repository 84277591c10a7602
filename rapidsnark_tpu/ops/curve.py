"""Vectorized complete projective group ops for G1 (Fq) and G2 (Fq2).

TPU-native replacement for ffiasm's curve.cpp Jacobian add/double/mixed
routines (SURVEY.md §2.12), using the Renes-Costello-Batina complete
formulas (eprint 2015/1060, Algorithms 7/8 for a = 0): branch-free and
complete for doubling/inverse/infinity by construction, so every adder
is a valid combiner for scan-style reductions over arbitrary point
batches (including repeated points, inverses, and infinities).

Points are (X, Y, Z) tuples of field elements; infinity is (0, 1, 0).
Coordinates stay in the Montgomery domain end-to-end — zkey points arrive
Montgomery-encoded (SURVEY.md §3.1) and only final results leave the
device for host-side affine normalization.

Curve: y^2 = x^3 + 3 over Fq; twist y^2 = x^3 + 3/(9+i) over Fq2; the
curve constant enters only via `b3` (3b), so one implementation serves
both groups.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from . import field as FF
from .field import FieldOps, FQ


class Fq2Ops:
    """Fq2 = Fq[i]/(i^2+1) with the FieldOps interface.

    Elements are (c0, c1) tuples of limb arrays. Every linear op stacks
    the two components into ONE base-field instantiation (graph-size
    discipline, see ops/field.py header): an Fq2 add costs the same
    compiled code as an Fq add on a 2x batch.
    """

    def __init__(self, base: FieldOps):
        self.f = base

    @staticmethod
    def _stack2(a):
        return jnp.stack([a[0], a[1]], axis=1)  # (16, 2, *batch)

    @staticmethod
    def _unstack2(v):
        return (v[:, 0], v[:, 1])

    def zero(self, shape=()):
        return (self.f.zero(shape), self.f.zero(shape))

    def one_mont(self, shape=()):
        return (self.f.one_mont(shape), self.f.zero(shape))

    def const(self, pair, shape=()):
        """Fq2 constant from a pair of pre-encoded (stored-form) ints."""
        return (self.f.const(pair[0], shape), self.f.const(pair[1], shape))

    def add(self, a, b):
        return self._unstack2(self.f.add(self._stack2(a), self._stack2(b)))

    def sub(self, a, b):
        return self._unstack2(self.f.sub(self._stack2(a), self._stack2(b)))

    def add_lazy(self, a, b):
        """Alias of the canonical add: Fq2-level lazy (< 2p) operands
        would push the Karatsuba interior sums in mul_many past the
        base-field mul's < 2p input bound."""
        return self.add(a, b)

    def neg(self, a):
        s = self._stack2(a)
        return self._unstack2(self.f.sub(self.f.zero(s.shape[1:]), s))

    def double(self, a):
        s = self._stack2(a)
        return self._unstack2(self.f.add(s, s))

    def mul(self, a, b):
        return self.mul_many([(a, b)])[0]

    def mul_many(self, pairs):
        """k Fq2 products as ONE base-field mul instantiation (3k lanes)
        plus ONE lazy-add instantiation for the Karatsuba interior sums.

        Karatsuba: m0 = a0 b0, m1 = a1 b1, t = (a0+a1)(b0+b1);
        re = m0 - m1, im = t - m0 - m1. Interior sums are lazily reduced
        (< 2p) which `FieldOps.mul` accepts.
        """
        f = self.f
        k = len(pairs)
        # (16, k, *batch) stacks of the Karatsuba interior sums
        asum = f.add_lazy(jnp.stack([p[0][0] for p in pairs], axis=1),
                          jnp.stack([p[0][1] for p in pairs], axis=1))
        bsum = f.add_lazy(jnp.stack([p[1][0] for p in pairs], axis=1),
                          jnp.stack([p[1][1] for p in pairs], axis=1))
        base_pairs = []
        for i, (a, b) in enumerate(pairs):
            base_pairs.append((a[0], b[0]))
            base_pairs.append((a[1], b[1]))
            base_pairs.append((asum[:, i], bsum[:, i]))
        outs = f.mul_many(base_pairs)
        # re = m0 - m1, im = (t - m0) - m1: two batched sub instantiations
        m0 = jnp.stack([outs[3 * i] for i in range(k)], axis=1)
        m1 = jnp.stack([outs[3 * i + 1] for i in range(k)], axis=1)
        t = jnp.stack([outs[3 * i + 2] for i in range(k)], axis=1)
        first = f.sub(jnp.concatenate([m0, t], axis=1),
                      jnp.concatenate([m1, m0], axis=1))
        re, tm0 = first[:, :k], first[:, k:]
        im = f.sub(tm0, m1)
        return [(re[:, i], im[:, i]) for i in range(k)]

    def sqr(self, a):
        return self.mul(a, a)

    def select(self, mask, a, b):
        return (self.f.select(mask, a[0], b[0]),
                self.f.select(mask, a[1], b[1]))

    def is_zero(self, a):
        return self.f.is_zero(a[0]) & self.f.is_zero(a[1])

    def eq(self, a, b):
        return self.f.eq(a[0], b[0]) & self.f.eq(a[1], b[1])


FQ2 = Fq2Ops(FQ)

Point = Tuple  # (x, y, z) of field elements


class CurveOps:
    """Shared point representation helpers over an abstract coordinate
    field. The group law lives in `ProjCurveOps` (the only production
    path); this base holds everything that is coordinate-system
    agnostic."""

    def __init__(self, f):
        self.f = f

    def is_inf(self, p: Point):
        return self.f.is_zero(p[2])

    def neg(self, p: Point) -> Point:
        return (p[0], self.f.neg(p[1]), p[2])

    def select(self, mask, a: Point, b: Point) -> Point:
        return tuple(self.f.select(mask, x, y) for x, y in zip(a, b))


class ProjCurveOps(CurveOps):
    """Complete group law in HOMOGENEOUS projective coordinates via the
    Renes-Costello-Batina formulas (eprint 2015/1060, Algorithms 7/8,
    a = 0): 12 field muls + two mul-by-3b per general add, NO per-case
    selects — complete for doubling/inverse/infinity by construction.
    This replaces the 23-mul Jacobian chord+tangent adder on the MSM hot
    paths (ffiasm uses incomplete Jacobian adds + branches; branch-free
    completeness is what makes these valid scan combiners).

    Points are (X, Y, Z); infinity is (0, 1, 0); affine lift (x, y, 1).
    `b3_mont` is 3*b of the curve in R-scaled (Montgomery) plain-int
    form, or None to use the G1 shortcut (b3 = 9: three doublings + add).
    """

    def __init__(self, f, b3_mont=None, b3_small=None):
        super().__init__(f)
        self.b3_mont = b3_mont
        # small-integer Fq2 constant (s0, s1) = 3b for shift-add chains
        # (no mont_mul): used by the MSM scan on the ISO-TWIST curve
        self.b3_small = b3_small
        # set on curves that are a sextic-rescaling image of another
        # curve: {"w2","w3","w2i","w3i"} Montgomery-encoded Fq2 pairs
        self.iso = None
        # a ProjCurveOps instance the MSM scan should substitute for
        # this one (points rescaled onto it by prepare_*): see G2P_ISO
        self.iso_scan = None

    # -- representation -------------------------------------------------------
    def inf(self, shape=()) -> Point:
        return (self.f.zero(shape), self.f.one_mont(shape),
                self.f.zero(shape))

    def from_affine(self, x, y) -> Point:
        """(0,0) encodes infinity (snarkjs zkey convention)."""
        inf_mask = self.f.is_zero(x) & self.f.is_zero(y)
        shape = _shape_of(x)
        one = self.f.one_mont(shape)
        zero = self.f.zero(shape)
        return (self.f.select(inf_mask, zero, x),
                self.f.select(inf_mask, one, y),
                self.f.select(inf_mask, zero, one))

    def _mul_b3(self, ts):
        """[b3 * t for t in ts] — one batched op. b3 = 9 (G1) is three
        doublings + add; b3_small (s0, s1) with s0=3, s1=27 (the G2
        iso-twist) is a shift-add chain (~9 linear field ops for the
        whole batch vs 6 base mont_muls, the round-3 G2 adder win);
        otherwise one constant mul_many."""
        f = self.f
        if self.b3_mont is None and self.b3_small is None:  # b3 = 9
            stacked = _tree_stack_leaves(ts)
            t8 = f.double(f.double(f.double(stacked)))
            out = f.add(t8, stacked)
            return _tree_unstack_leaves(out, len(ts))
        if self.b3_small is not None:
            assert self.b3_small == (3, 27), "chain below is for 3+27i"
            base = f.f  # Fq2 -> base-field ops
            # stack all components: t*(3+27i) = (3t0-27t1, 27t0+3t1)
            k = len(ts)
            s = jnp.stack([t[j] for j in (0, 1) for t in ts],
                          axis=1)                 # (16, 2k, *batch)
            s3 = base.add(base.double(s), s)      # 3t
            s27 = base.add(base.double(base.double(base.double(s3))), s3)
            re = base.sub(s3[:, :k], s27[:, k:])  # 3t0 - 27t1
            im = base.add(s27[:, :k], s3[:, :k * 2][:, k:])  # 27t0 + 3t1
            return [(re[:, i], im[:, i]) for i in range(k)]
        shape = _shape_of(ts[0])
        c = f.const(self.b3_mont, shape)
        return f.mul_many([(t, c) for t in ts])

    # -- group law (RCB Algorithm 7, a = 0) ------------------------------------
    def add(self, p: Point, q: Point) -> Point:
        f = self.f
        x1, y1, z1 = p
        x2, y2, z2 = q
        la = f.add_lazy
        t0, t1, t2, s3, s4, s5 = f.mul_many([
            (x1, x2), (y1, y2), (z1, z2),
            (la(x1, y1), la(x2, y2)),
            (la(y1, z1), la(y2, z2)),
            (la(x1, z1), la(x2, z2)),
        ])
        t3 = f.sub(f.sub(s3, t0), t1)        # X1Y2 + X2Y1
        t4 = f.sub(f.sub(s4, t1), t2)        # Y1Z2 + Y2Z1
        t5 = f.sub(f.sub(s5, t0), t2)        # X1Z2 + X2Z1
        t0_3 = f.add(f.double(t0), t0)       # 3*t0 (a = 0)
        t2b, y3b = self._mul_b3([t2, t5])    # b3*t2, b3*(X1Z2+X2Z1)
        z3 = f.add(t1, t2b)
        t1m = f.sub(t1, t2b)
        m1, m2, m3, m4, m5, m6 = f.mul_many([
            (t4, y3b), (t3, t1m), (y3b, t0_3),
            (t1m, z3), (t0_3, t3), (z3, t4),
        ])
        x3 = f.sub(m2, m1)
        y3 = f.add(m4, m3)
        z3o = f.add(m6, m5)
        return (x3, y3, z3o)

    # -- mixed add (RCB Algorithm 8, a = 0, Z2 = 1) -----------------------------
    def add_mixed(self, p: Point, q) -> Point:
        """P + (x2, y2) with (0,0) encoding the affine point at infinity
        (handled with one select — affine coordinates cannot represent
        it, everything else is complete)."""
        f = self.f
        x1, y1, z1 = p
        x2, y2 = q
        la = f.add_lazy
        t0, t1, s3, t4a, y3a = f.mul_many([
            (x1, x2), (y1, y2),
            (la(x1, y1), la(x2, y2)),
            (y2, z1), (x2, z1),
        ])
        t3 = f.sub(f.sub(s3, t0), t1)        # X1Y2 + X2Y1
        t4 = f.add(t4a, y1)                  # Y2Z1 + Y1
        y3l = f.add(y3a, x1)                 # X2Z1 + X1
        t0_3 = f.add(f.double(t0), t0)       # 3*t0
        t2b, y3b = self._mul_b3([z1, y3l])   # b3*Z1, b3*(X2Z1+X1)
        z3 = f.add(t1, t2b)
        t1m = f.sub(t1, t2b)
        m1, m2, m3, m4, m5, m6 = f.mul_many([
            (t4, y3b), (t3, t1m), (y3b, t0_3),
            (t1m, z3), (t0_3, t3), (z3, t4),
        ])
        out = (f.sub(m2, m1), f.add(m4, m3), f.add(m6, m5))
        q_inf = f.is_zero(x2) & f.is_zero(y2)
        return self.select(q_inf, p, out)

    def double(self, p: Point) -> Point:
        return self.add(p, p)

    # -- relaxed (lazy-reduction) group law: coords in [0, 2p] ------------------
    # Same RCB formulas with the field ops' relaxed family
    # (ops/field.py "relaxed domain"): muls skip the final conditional
    # subtraction, linear chains run as deferred raw limb adds resolved
    # once, and every named value re-enters [0, 2p] with ONE
    # cond_sub_2p. Residues are exact; representatives are not
    # canonical, so consumers must reduce mod p before comparing
    # (the host combine does: prover.py / utils/points int conversion).
    # G1 only (b3 = 9; self.f a base FieldOps): the Fq2 adder keeps the
    # canonical path — its Karatsuba interior sums break the <= 2p
    # bound algebra and the measured G2 upside is marginal.
    #
    # Value-bound ledger (units of p; mul(a<=A*p, b<=B*p) <= (kAB+1)p
    # with k = p/2^256 = 0.18903; asserts at the bottom of
    # ops/field.py pin the two tight cases exactly):
    #   stage-A products of <=2p coords:            <= 1.757p
    #   t3/t4/t5 = deferred pair sums -> dadd_rx:   <= 2p
    #   t0_3 = 3*t0 deferred (<= 5.27p < 2^256):    resolve+cs2p <= 3.27p
    #   b3 terms: const mont-mul by 9R (< p):       <= 1.757p
    #   stage-B products (partners <= 2p | 3.27p):  <= 2.24p
    #   outputs x3/y3/z3: add/sub_rx of the above:  <= 2p

    def _b3_const(self, shape):
        f = self.f
        return f.const(9 * f.r1 % f.modulus, shape)

    def add_rx(self, p: Point, q: Point) -> Point:
        """Complete add, relaxed: coords of BOTH operands <= 2p."""
        f = self.f
        x1, y1, z1 = p
        x2, y2, z2 = q
        mm = lambda prs: f.mul_many(prs, cond_sub=False)  # noqa: E731
        t0, t1, t2, u0, u1, v0, v1, w0, w1 = mm([
            (x1, x2), (y1, y2), (z1, z2),
            (x1, y2), (y1, x2),            # t3 = X1Y2 + X2Y1, direct:
            (y1, z2), (z1, y2),            # the Karatsuba form's interior
            (x1, z2), (z1, x2),            # sums break the 2p ledger
        ])
        t3 = f.dadd_rx(u0 + u1, 3.52)
        t4 = f.dadd_rx(v0 + v1, 3.52)
        t5 = f.dadd_rx(w0 + w1, 3.52)
        c9 = self._b3_const(_shape_of(t2))
        t2b, y3b = mm([(t2, c9), (t5, c9)])          # <= 1.757p
        t0_3 = f.cond_sub_2p(FF._resolve_wide(t0 + t0 + t0))  # <= 3.27p
        z3 = f.add_rx(t1, t2b)
        t1m = f.sub_rx(t1, t2b)
        m1, m2, m3, m4, m5, m6 = mm([
            (t4, y3b), (t3, t1m), (y3b, t0_3),
            (t1m, z3), (t0_3, t3), (z3, t4),
        ])
        return (f.sub_rx(m2, m1), f.add_rx(m4, m3),
                f.cond_sub_2p(FF._resolve_wide(m6 + m5)))

    def add_mixed_rx(self, p: Point, q) -> Point:
        """Jacobian(<=2p) + CANONICAL affine (x2, y2 < p; (0,0) = inf),
        relaxed. The affine operand tightens the stage-A bounds
        (products <= 1.38p), so t0_3 <= 4.14p still resolves exactly."""
        f = self.f
        x1, y1, z1 = p
        x2, y2 = q
        mm = lambda prs: f.mul_many(prs, cond_sub=False)  # noqa: E731
        c9 = self._b3_const(_shape_of(x1))
        t0, t1, u0, u1, t4a, y3a, t2b = mm([
            (x1, x2), (y1, y2),
            (x1, y2), (y1, x2),
            (y2, z1), (x2, z1),
            (z1, c9),
        ])
        t3 = f.dadd_rx(u0 + u1, 2.76)
        t4 = f.dadd_rx(t4a + y1, 3.38)
        y3l = f.dadd_rx(y3a + x1, 3.38)
        t0_3 = f.cond_sub_2p(FF._resolve_wide(t0 + t0 + t0))  # <= 2.14p
        y3b = f.mul(y3l, c9, cond_sub=False)                  # <= 1.38p
        z3 = f.add_rx(t1, t2b)
        t1m = f.sub_rx(t1, t2b)
        m1, m2, m3, m4, m5, m6 = mm([
            (t4, y3b), (t3, t1m), (y3b, t0_3),
            (t1m, z3), (t0_3, t3), (z3, t4),
        ])
        out = (f.sub_rx(m2, m1), f.add_rx(m4, m3), f.add_rx(m6, m5))
        q_inf = f.is_zero(x2) & f.is_zero(y2)
        return self.select(q_inf, p, out)

    def neg_rx(self, p: Point) -> Point:
        return (p[0], self.f.neg_rx(p[1]), p[2])


def _relaxed_enabled() -> bool:
    # read ONCE at import: trace-time reads would go stale against
    # cached jit executables (the flag is effectively a static compile
    # option — flipping the env mid-process cannot retrace cached
    # programs, so a late read would silently lie)
    import os
    return os.environ.get("RSTPU_RELAXED", "1") != "0"


RELAXED = _relaxed_enabled()


def relaxed_for(curve) -> bool:
    """Whether the MSM pipeline should run `curve`'s group law in the
    relaxed [0, 2p] domain (RSTPU_RELAXED=0 at import disables). G1
    only: the Fq2 Karatsuba interior sums break the 2p bound ledger and
    the measured G2 upside is marginal. Consumers of relaxed results
    must reduce mod p before comparing representatives (the prover's
    host combine does; ops/msm window totals are equal only as
    residues)."""
    if not isinstance(curve, ProjCurveOps) or isinstance(curve.f, Fq2Ops):
        return False
    if curve.b3_mont is not None or curve.b3_small is not None:
        return False  # add_rx hard-codes the G1 b3 = 9 constant
    return RELAXED


def _tree_stack_leaves(elems):
    if isinstance(elems[0], tuple):
        return tuple(_tree_stack_leaves([e[k] for e in elems])
                     for k in range(len(elems[0])))
    return jnp.stack(elems, axis=1)


def _tree_unstack_leaves(stacked, k):
    def ix(e, i):
        if isinstance(e, tuple):
            return tuple(ix(c, i) for c in e)
        return e[:, i]
    return [tuple(ix(c, i) for c in stacked) if isinstance(stacked, tuple)
            else stacked[:, i] for i in range(k)]


def _shape_of(elem):
    """Batch shape of a field element ((16,*batch) array or Fq2 pair)."""
    while isinstance(elem, tuple):
        elem = elem[0]
    return elem.shape[1:]


def _map_leaves(elem, fn):
    if isinstance(elem, tuple):
        return tuple(_map_leaves(e, fn) for e in elem)
    return fn(elem)


# RCB complete-projective instances (the MSM/prover hot path).
# G1: b3 = 9 (adds). G2 twist: b = 3/(9+i), b3 = 9/(9+i), Montgomery-
# encoded so mul against Montgomery coordinates stays in the domain.
from ..ref import field as _rf  # noqa: E402

_B3_G2 = _rf.fq2_scalar(_rf.FQ2_B, 3)
G1P = ProjCurveOps(FQ)
G2P = ProjCurveOps(
    FQ2, b3_mont=(_B3_G2[0] * (1 << 256) % _rf.P,
                  _B3_G2[1] * (1 << 256) % _rf.P))

# --- G2 iso-twist for the MSM scan -----------------------------------------
# The sextic rescaling phi(x, y) = (w2*x, w3*y) with w2 = u^2, w3 = u^3,
# u^6 = b'/b maps the zkey twist y^2 = x^3 + 3/(9+i) onto the isomorphic
# curve y^2 = x^3 + (1+9i), whose b3 = 3+27i multiplies by a SHIFT-ADD
# CHAIN instead of two Fq2 const mont_muls — ~6 base-field muls saved in
# every fused G2 scan add (~15% of the G2 MSM phase). u was computed
# once offline (Fq2* has order p^2-1 = 144*m with gcd(6, m) = 1, so
# u = ratio^(6^-1 mod m) * zeta for one of 144 subgroup elements zeta);
# the generator-maps-onto-b' identity is asserted in tests/test_msm_jax.
# prepare_g2 rescales the point tables once at build; msm() rescales the
# per-window totals BACK (w2i/w3i), so everything outside ops/msm sees
# only the original twist. phi fixes (0,0), so the affine-infinity
# encoding survives.
_U_ISO = (10260616272614354744484718587529940670282782517928141346158505320275271402618,
          11627626599224920477761687157727334418413528639369682316530532574369954805965)


def _f2mul(a, b):
    p = _rf.P
    return ((a[0] * b[0] - a[1] * b[1]) % p, (a[0] * b[1] + a[1] * b[0]) % p)


def _f2inv(a):
    p = _rf.P
    d = pow((a[0] * a[0] + a[1] * a[1]) % p, -1, p)
    return (a[0] * d % p, (p - a[1]) * d % p)


def _mont2(a):
    return (a[0] * (1 << 256) % _rf.P, a[1] * (1 << 256) % _rf.P)


_W2 = _f2mul(_U_ISO, _U_ISO)
_W3 = _f2mul(_W2, _U_ISO)
G2P_ISO = ProjCurveOps(FQ2, b3_small=(3, 27))
G2P_ISO.iso = {"w2": _mont2(_W2), "w3": _mont2(_W3),
               "w2i": _mont2(_f2inv(_W2)), "w3i": _mont2(_f2inv(_W3))}
G2P.iso_scan = G2P_ISO
