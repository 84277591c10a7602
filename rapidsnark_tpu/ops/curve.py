"""Vectorized Jacobian-coordinate group ops for G1 (Fq) and G2 (Fq2).

TPU-native replacement for ffiasm's curve.cpp Jacobian add/double/mixed
routines (SURVEY.md §2.12). Everything is branch-free: the general `add`
computes both the chord and tangent paths and selects per lane, so it is
a valid combiner for `associative_scan`-style reductions over arbitrary
point batches (including repeated points, inverses, and infinities).

Points are (X, Y, Z) tuples of field elements; infinity is Z == 0.
Coordinates stay in the Montgomery domain end-to-end — zkey points arrive
Montgomery-encoded (SURVEY.md §3.1) and only final results leave the
device for host-side affine normalization.

Curve: y^2 = x^3 + 3 over Fq; twist y^2 = x^3 + 3/(9+i) over Fq2. The
formulas below never use the curve constant, so one implementation
serves both groups.
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
    """Jacobian group law over an abstract coordinate field."""

    def __init__(self, f):
        self.f = f

    # -- representation -------------------------------------------------------
    def inf(self, shape=()) -> Point:
        return (self.f.one_mont(shape), self.f.one_mont(shape),
                self.f.zero(shape))

    def from_affine(self, x, y) -> Point:
        """Affine (Montgomery) coords -> Jacobian; (0,0) encodes infinity
        (snarkjs zkey convention for the point at infinity)."""
        inf_mask = self.f.is_zero(x) & self.f.is_zero(y)
        shape = _shape_of(x)
        one = self.f.one_mont(shape)
        z = self.f.select(inf_mask, self.f.zero(shape), one)
        return (self.f.select(inf_mask, one, x),
                self.f.select(inf_mask, one, y), z)

    def is_inf(self, p: Point):
        return self.f.is_zero(p[2])

    def neg(self, p: Point) -> Point:
        return (p[0], self.f.neg(p[1]), p[2])

    def select(self, mask, a: Point, b: Point) -> Point:
        return tuple(self.f.select(mask, x, y) for x, y in zip(a, b))

    # -- group law -------------------------------------------------------------
    # Graph-size discipline: independent field products inside each
    # formula are batched through f.mul_many so a full Jacobian op costs
    # a handful of mul instantiations, not 23 (see ops/field.py header).

    def double(self, p: Point) -> Point:
        """2P, a = 0 curve. Handles infinity (Z=0 stays Z=0)."""
        f = self.f
        x, y, z = p
        a, b, yz = f.mul_many([(x, x), (y, y), (y, z)])
        e = f.add(f.double(a), a)  # 3a
        xb = f.add(x, b)
        c, xb2, e2 = f.mul_many([(b, b), (xb, xb), (e, e)])
        # d = 2((x+b)^2 - a - c)
        d = f.double(f.sub(f.sub(xb2, a), c))
        x3 = f.sub(e2, f.double(d))
        c8 = f.double(f.double(f.double(c)))
        (ed,) = f.mul_many([(e, f.sub(d, x3))])
        y3 = f.sub(ed, c8)
        z3 = f.double(yz)
        return (x3, y3, z3)

    def add(self, p: Point, q: Point) -> Point:
        """P + Q, complete w.r.t. infinity / equality / inverses.

        Branch-free: computes chord and tangent paths (sharing batched
        mul stages), selects per lane. Valid as a scan combiner.
        """
        f = self.f
        x1, y1, z1 = p
        x2, y2, z2 = q

        # stage 1: squares + tangent-path products
        z1z1, z2z2, ta, tb, tyz = f.mul_many(
            [(z1, z1), (z2, z2), (x1, x1), (y1, y1), (y1, z1)])
        # stage 2
        u1, u2, z2c, z1c, z1z2, tc, txb2, te2 = f.mul_many([
            (x1, z2z2), (x2, z1z1), (z2z2, z2), (z1z1, z1), (z1, z2),
            (tb, tb),
            (f.add(x1, tb), f.add(x1, tb)),
            (f.add(f.double(ta), ta), f.add(f.double(ta), ta)),
        ])
        te = f.add(f.double(ta), ta)          # 3*x1^2 (tangent slope num)
        td = f.double(f.sub(f.sub(txb2, ta), tc))
        tx3 = f.sub(te2, f.double(td))
        # stage 3
        s1, s2 = f.mul_many([(y1, z2c), (y2, z1c)])
        h = f.sub(u2, u1)
        r = f.sub(s2, s1)
        # stage 4
        hh, rsq, ted = f.mul_many([(h, h), (r, r), (te, f.sub(td, tx3))])
        ty3 = f.sub(ted, f.double(f.double(f.double(tc))))
        tz3 = f.double(tyz)
        # stage 5
        hhh, v, z3 = f.mul_many([(h, hh), (u1, hh), (z1z2, h)])
        x3 = f.sub(f.sub(rsq, hhh), f.double(v))
        # stage 6
        w1, w2 = f.mul_many([(r, f.sub(v, x3)), (s1, hhh)])
        y3 = f.sub(w1, w2)
        out = (x3, y3, z3)

        h_zero = f.is_zero(h)
        r_zero = f.is_zero(r)
        p_inf = f.is_zero(z1)
        q_inf = f.is_zero(z2)
        both = (~p_inf) & (~q_inf)

        shape = _shape_of(x1)
        out = self.select(both & h_zero & r_zero, (tx3, ty3, tz3), out)
        out = self.select(both & h_zero & (~r_zero), self.inf(shape), out)
        out = self.select(p_inf, q, out)
        out = self.select(q_inf & (~p_inf), p, out)
        return out

    def add_mixed(self, p: Point, q) -> Point:
        """P + Q with Q AFFINE ((x2, y2); (0,0) encodes infinity) —
        z2 = 1 saves 5 of the general adder's 23 field muls, and affine
        columns halve the gather traffic of the MSM prefix scan.
        Complete like `add`: tangent/inverse/infinity lanes select out.
        """
        f = self.f
        x1, y1, z1 = p
        x2, y2 = q

        # stage 1: squares + tangent-path products
        z1z1, ta, tb, tyz = f.mul_many(
            [(z1, z1), (x1, x1), (y1, y1), (y1, z1)])
        e1 = f.add(x1, tb)
        te = f.add(f.double(ta), ta)          # 3*x1^2
        # stage 2
        u2, z1c, tc, txb2, te2 = f.mul_many([
            (x2, z1z1), (z1z1, z1), (tb, tb), (e1, e1), (te, te)])
        # stage 3
        (s2,) = f.mul_many([(y2, z1c)])
        h = f.sub(u2, x1)                     # u1 = x1 (z2 = 1)
        r = f.sub(s2, y1)                     # s1 = y1
        td = f.double(f.sub(f.sub(txb2, ta), tc))
        tx3 = f.sub(te2, f.double(td))
        # stage 4
        hh, rsq, ted = f.mul_many([(h, h), (r, r), (te, f.sub(td, tx3))])
        ty3 = f.sub(ted, f.double(f.double(f.double(tc))))
        tz3 = f.double(tyz)
        # stage 5
        hhh, v, z3 = f.mul_many([(h, hh), (x1, hh), (z1, h)])
        x3 = f.sub(f.sub(rsq, hhh), f.double(v))
        # stage 6
        w1, w2 = f.mul_many([(r, f.sub(v, x3)), (y1, hhh)])
        y3 = f.sub(w1, w2)
        out = (x3, y3, z3)

        h_zero = f.is_zero(h)
        r_zero = f.is_zero(r)
        p_inf = f.is_zero(z1)
        q_inf = f.is_zero(x2) & f.is_zero(y2)
        both = (~p_inf) & (~q_inf)

        shape = _shape_of(x1)
        out = self.select(both & h_zero & r_zero, (tx3, ty3, tz3), out)
        out = self.select(both & h_zero & (~r_zero), self.inf(shape), out)
        out = self.select(p_inf, self.from_affine(x2, y2), out)
        out = self.select(q_inf & (~p_inf), p, out)
        return out

    def scalar_mul(self, p: Point, scalar_packed, bits: int = 256) -> Point:
        """[k]P with k as a (..., 16) packed uint32 limb array (plain
        integer, not reduced — matching mulByScalar byte semantics,
        groth16.cpp:223-245).

        fori_loop double-and-add sharing ONE adder instantiation across
        the accumulate and double phases (graph-size discipline: every
        unrolled Jacobian op costs ~3k HLO ops after limb expansion;
        doubling is the complete adder's tangent path).
        """
        import jax

        shape = _shape_of(p[0])
        identity = self.inf(shape)

        def body(i, state):
            acc, cur = state
            step, phase = i // 2, i % 2
            limb = jnp.take(scalar_packed, step >> 4, axis=-1)
            bit = ((limb >> (step.astype(jnp.uint32) & 15)) & 1
                   ).astype(jnp.bool_)
            # phase 0: acc += bit ? cur : O;   phase 1: cur += cur
            x = self.select(phase == 1, cur, acc)
            y = self.select(phase == 1, cur,
                            self.select(bit, cur, identity))
            z = self.add(x, y)
            acc = self.select(phase == 0, z, acc)
            cur = self.select(phase == 1, z, cur)
            return acc, cur

        acc, _ = jax.lax.fori_loop(0, 2 * bits, body, (identity, p))
        return acc

    def tree_reduce(self, pts: Point) -> Point:
        """Sum a batch of points along axis 0 with a balanced tree.

        pts coordinates carry a leading batch axis; static shapes: the
        batch is halved (padding odd levels with infinity) log2(n) times.
        """
        n = _shape_of(pts[0])[0]
        while n > 1:
            if n % 2 == 1:
                pad = self.inf((1,) + _shape_of(pts[0])[1:])
                pts = tuple(
                    _map_leaves2(a, b,
                                 lambda u, v: jnp.concatenate([u, v], axis=1))
                    for a, b in zip(pts, pad))
                n += 1
            lo = _tree_index(pts, slice(0, n, 2))
            hi = _tree_index(pts, slice(1, n, 2))
            pts = self.add(lo, hi)
            n //= 2
        return _tree_index(pts, 0)


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

    def __init__(self, f, b3_mont=None):
        super().__init__(f)
        self.b3_mont = b3_mont

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
        doublings + add; otherwise one constant mul_many."""
        f = self.f
        if self.b3_mont is None:  # b3 = 9: 8t + t
            stacked = _tree_stack_leaves(ts)
            t8 = f.double(f.double(f.double(stacked)))
            out = f.add(t8, stacked)
            return _tree_unstack_leaves(out, len(ts))
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


def _tree_index(pt, idx):
    """Index the leading batch axis (axis 1 of each (16, n, ...) leaf)."""
    return tuple(_map_leaves(c, lambda a: a[:, idx]) for c in pt)


def _map_leaves2(a, b, fn):
    if isinstance(a, tuple):
        return tuple(_map_leaves2(x, y, fn) for x, y in zip(a, b))
    return fn(a, b)


G1 = CurveOps(FQ)
G2 = CurveOps(FQ2)

# RCB complete-projective instances (the MSM/prover hot path).
# G1: b3 = 9 (adds). G2 twist: b = 3/(9+i), b3 = 9/(9+i), Montgomery-
# encoded so mul against Montgomery coordinates stays in the domain.
from ..ref import field as _rf  # noqa: E402

_B3_G2 = _rf.fq2_scalar(_rf.FQ2_B, 3)
G1P = ProjCurveOps(FQ)
G2P = ProjCurveOps(
    FQ2, b3_mont=(_B3_G2[0] * (1 << 256) % _rf.P,
                  _B3_G2[1] * (1 << 256) % _rf.P))
