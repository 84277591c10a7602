"""Vectorized multi-limb Montgomery field arithmetic for TPU (JAX).

This replaces ffiasm's generated x86-64 ADX assembly (reference layer L0,
SURVEY.md §1, §2.12) with a formulation the TPU VPU vectorizes.

Representation: a field element batch is ONE uint32 array of shape
(16, *batch) — 16 little-endian 16-bit limbs on the LEADING axis, batch
on the trailing axes. On TPU the trailing axis maps to vector lanes
(full 128-lane utilization); limb-index operations are cheap leading-axis
slices. The same code runs as plain XLA ops and inside Pallas kernel
bodies (only elementwise ops, static slices and dynamic_update_slice —
no gathers in the field layer).

Why 16-bit limbs in uint32 (the central invariant):
  * limb products of canonical operands are exact in uint32
    (0xffff^2 < 2^32); TPUs have no 64-bit integer multiply;
  * products are split into lo/hi 16-bit halves and accumulated in
    columns with >10 bits of headroom — carries are deferred and then
    resolved in O(log n) with a Kogge-Stone generate/propagate pass;
  * Montgomery REDC with word 2^16 and R = 2^256 = (2^16)^16 matches
    the zkey/wtns on-disk convention exactly (SURVEY.md §3.1).

Graph-size discipline: one mont_mul is ~250 HLO ops, one field add ~90.
Composite algorithms (curve ops, NTT, MSM) must keep the number of
*instantiations* bounded with lax.scan / fori_loop — an unrolled
Jacobian ladder does not compile in reasonable time.

All values are canonical (< modulus) between public ops.
"""

from __future__ import annotations

import jax.numpy as jnp

NLIMBS = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1

Elem = jnp.ndarray  # (16, *batch) uint32

# When True, `mul` unrolls its 16 CIOS steps instead of lax.scan —
# required inside Pallas kernel bodies (ops/fused.py), where scan
# carries would spill to memory.
_FORCE_UNROLL = False


def force_unroll():
    import contextlib

    @contextlib.contextmanager
    def ctx():
        global _FORCE_UNROLL
        prev = _FORCE_UNROLL
        _FORCE_UNROLL = True
        try:
            yield
        finally:
            _FORCE_UNROLL = prev

    return ctx()


def unpack(arr) -> Elem:
    """(..., 16) uint32 (API/disk layout) -> (16, ...) internal layout."""
    return jnp.moveaxis(arr, -1, 0)


def pack(elem: Elem) -> jnp.ndarray:
    """(16, ...) internal -> (..., 16)."""
    return jnp.moveaxis(elem, 0, -1)


def _shift_down(x, sh: int):
    """Along the limb axis: out[j] = x[j - sh], zero-filled below."""
    return jnp.concatenate([jnp.zeros_like(x[:sh]), x[:-sh]], axis=0)


# CPU backend: resolve carries with a 16-step lax.scan ripple instead of
# the Kogge-Stone concat form. XLA:CPU's kernel emitter turns every
# concatenate/pad into its OWN kernel module (each paying a full
# MLIR+LLVM pipeline, ~100ms), so one Kogge-Stone adder costs ~20
# kernels and a complete curve add ~200 — the measured cause of the
# multi-minute pipeline compiles on the 8-virtual-device test mesh. The
# ripple is one while loop (compiled once), 30x faster to compile;
# sequential-step runtime is irrelevant at CPU test scale. TPU and
# Pallas kernel bodies keep Kogge-Stone (log-depth, concat-friendly).
_SCAN_CARRIES = None


def _scan_carries() -> bool:
    global _SCAN_CARRIES
    if _FORCE_UNROLL:
        return False
    if _SCAN_CARRIES is None:
        import jax
        _SCAN_CARRIES = jax.default_backend() == "cpu"
    return _SCAN_CARRIES


def _ripple(s):
    """Exact carry resolution of deferred-carry limbs (any per-limb
    value < 2^31): one lax.scan over the limb axis. Returns (canonical
    limbs, carry_out_of_top != 0)."""
    import jax

    def body(carry, limb):
        t = limb + carry
        return t >> LIMB_BITS, t & MASK

    carry, out = jax.lax.scan(
        body, jnp.zeros(s.shape[1:], dtype=jnp.uint32), s)
    return out, carry != 0


def _resolve_ones(base, c):
    """Exact carry resolution when per-limb carries are 0/1.

    base: limbs <= MASK; c[j] in {0,1}: carry generated OUT of limb j.
    Kogge-Stone generate/propagate prefix in log2(16) = 4 rounds.
    Masks stay uint32 0/1 (Mosaic cannot concatenate i1 vectors inside
    Pallas kernels). Returns (canonical limbs, carry_out_of_top: bool).
    """
    if _scan_carries():
        return _ripple(base + (c << LIMB_BITS))
    g = c  # uint32 0/1
    p = (base == MASK).astype(jnp.uint32)
    for sh in (1, 2, 4, 8):
        g = g | (p & _shift_down(g, sh))
        p = p & _shift_down(p, sh)
    carry_in = _shift_down(g, 1)
    out = (base + carry_in) & MASK
    # static top-limb index (g[-1] would lower to dynamic_slice, which
    # Mosaic does not support inside Pallas kernels)
    return out, g[g.shape[0] - 1] != 0


def _split_resolve(s):
    """Resolve limbs < 2^17 (one deferred carry bit per limb)."""
    if _scan_carries():
        return _ripple(s)
    return _resolve_ones(s & MASK, s >> LIMB_BITS)


def _resolve_wide(s):
    """Resolve limbs < 2^26 (multi-bit deferred carries): one split-add
    pass brings carries to 0/1, then Kogge-Stone. Carry out of the top
    limb must be structurally impossible at call sites."""
    if _scan_carries():
        return _ripple(s)[0]
    c = s >> LIMB_BITS
    s2 = (s & MASK) + _shift_down(c, 1)
    out, _ = _split_resolve(s2)
    return out


class FieldOps:
    """Montgomery arithmetic mod `modulus`, R = 2^256.

    Stateless apart from Python-int constants baked into the traced
    graph; safe inside jit / shard_map / Pallas kernel bodies.
    """

    def __init__(self, modulus: int):
        self.modulus = modulus
        self.p_int = [(modulus >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS)]
        self.n0inv = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self.r1 = (1 << 256) % modulus
        self.r2 = (1 << 512) % modulus
        self.rinv = pow(1 << 256, -1, modulus)
        self._p_np = list(self.p_int)
        # two's-complement constant for >= p test / subtract: (MASK^p) + 1
        notp = [(MASK ^ v) for v in self.p_int]
        notp[0] += 1  # p is odd, so no limb overflow
        self._notp1_np = notp
        # relaxed-domain constants (values live in [0, 2p]; see the
        # mul/add_rx family below): 2p fits 16 limbs since p < 2^255
        p2 = 2 * modulus
        self._p2_np = [(p2 >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS)]
        notp2 = [(MASK ^ v) for v in self._p2_np]
        notp2[0] += 1  # (may be 2^16 when 2p's limb0 is 0: still < 2^17)
        self._notp2_1np = notp2
        # a - b + 2p == a + (~b) + (2p + 1) - 2^256 (top carry dropped)
        p2p1 = p2 + 1
        self._sub2p_np = [(p2p1 >> (LIMB_BITS * i)) & MASK
                          for i in range(NLIMBS)]

    # -- constants ----------------------------------------------------------
    # Limb constants are built from INLINE SCALARS (stack of immediates),
    # never from materialized arrays: Pallas kernel bodies reject captured
    # array constants, and XLA constant-folds the stack anyway.
    @staticmethod
    def _c(vals, ndim: int):
        # built at the target rank directly: Mosaic cannot shape-cast a
        # 1D vector constant up to (k, 1, 1)
        one = (1,) * (ndim - 1)
        parts = [jnp.full((1,) + one, jnp.uint32(x)) for x in vals]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

    @staticmethod
    def _limb_add_const(x: Elem, vals) -> Elem:
        """x + limb-vector constant. In kernel mode, per-limb scalar
        splats (Mosaic cannot broadcast a (k,1,1) constant over sublanes
        AND lanes); otherwise one broadcast add."""
        if _FORCE_UNROLL:
            return jnp.concatenate(
                [x[j:j + 1] + jnp.uint32(v) for j, v in enumerate(vals)],
                axis=0)
        return x + FieldOps._c(vals, x.ndim)

    def const(self, value: int, shape=()) -> Elem:
        value %= self.modulus
        limbs = [(value >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS)]
        if _FORCE_UNROLL:
            return jnp.concatenate(
                [jnp.full((1,) + tuple(shape), jnp.uint32(v))
                 for v in limbs], axis=0)
        return jnp.broadcast_to(
            self._c(limbs, 1 + len(shape)), (NLIMBS,) + tuple(shape))

    def zero(self, shape=()) -> Elem:
        return jnp.zeros((NLIMBS,) + tuple(shape), dtype=jnp.uint32)

    def one_mont(self, shape=()) -> Elem:
        return self.const(self.r1, shape)

    # -- selection / predicates ----------------------------------------------
    @staticmethod
    def select(mask, a: Elem, b: Elem) -> Elem:
        """mask ? a : b; mask is batch-shaped (broadcast over limbs)."""
        return jnp.where(mask[None], a, b)

    @staticmethod
    def is_zero(a: Elem):
        # compare-then-reduce (a bool all-reduce): the uint or-reduce +
        # compare form trips a Mosaic verifier bug inside Pallas kernels
        return jnp.all(a == 0, axis=0)

    @staticmethod
    def eq(a: Elem, b: Elem):
        return jnp.all(a == b, axis=0)

    # -- modular ring ops ------------------------------------------------------
    def _cond_sub_p(self, s: Elem) -> Elem:
        """s < 2p, canonical limbs -> s mod p."""
        t = self._limb_add_const(s, self._notp1_np)
        red, ge = _resolve_ones(t & MASK, t >> LIMB_BITS)
        return jnp.where(ge[None], red, s)

    def add(self, a: Elem, b: Elem) -> Elem:
        s, _ = _split_resolve(a + b)  # < 2p < 2^255: no top carry
        return self._cond_sub_p(s)

    def sub(self, a: Elem, b: Elem) -> Elem:
        # a - b via two's complement; add p back on borrow
        t = a + (jnp.uint32(MASK) ^ b)
        t = jnp.concatenate([t[0:1] + 1, t[1:]], axis=0)
        d, ok = _resolve_ones(t & MASK, t >> LIMB_BITS)
        e, _ = _split_resolve(self._limb_add_const(d, self._p_np))
        return jnp.where(ok[None], d, e)

    def neg(self, a: Elem) -> Elem:
        return self.sub(self.zero(a.shape[1:]), a)

    def double(self, a: Elem) -> Elem:
        return self.add(a, a)

    # -- Montgomery multiply -----------------------------------------------------
    def mul(self, a: Elem, b: Elem, unroll: bool = False,
            cond_sub: bool = True) -> Elem:
        """mont_mul: a*b*R^-1 mod p. Canonical in, canonical (< p) out.
        Inputs may be lazily reduced (< 2p) as long as limbs are < 2^16.

        cond_sub=False (the relaxed-domain form) skips the final
        conditional subtraction: output < (a*b/R + p), exact in 16 limbs
        whenever a*b < R*(R - p) — i.e. alpha*beta <= 22.7 for inputs
        bounded by alpha*p, beta*p. Callers track bounds (ops/curve
        *_rx formulas carry them as trace-time asserts).

        CIOS with a *sliding 17-column window*: at step i the window
        holds columns i..i+16, step i adds the a_i*b partial product and
        one REDC round (word 2^16), then shifts — static slices only, no
        dynamic indexing, so the body is ~30 ops and runs under lax.scan
        (the whole mul is ~300 HLO lines) or unrolled for Pallas bodies.

        Column bound: each window column accumulates <= 16 product
        half-pairs (< 2^17 each) plus <= 16 reduction halves: < 2^22.
        """
        batch = a.shape[1:]
        nd = a.ndim
        p_col = self._c(self._p_np[1:], nd)      # (15, 1...) constant
        n0inv = jnp.uint32(self.n0inv)
        p0 = jnp.uint32(self.p_int[0])
        zero1 = jnp.zeros((1,) + batch, dtype=jnp.uint32)

        def step(state, ai):
            cols, carry = state
            prod = ai[None] * b                  # (16,*batch), exact
            plo = prod & MASK
            phi = prod >> LIMB_BITS
            contrib = jnp.concatenate(
                [plo[0:1], plo[1:] + phi[:-1], phi[-1:]], axis=0)  # (17,b)
            cols = cols + contrib
            cur = cols[0] + carry
            m = (cur * n0inv) & MASK
            q0 = m * p0
            carry = ((cur + (q0 & MASK)) >> LIMB_BITS) + (q0 >> LIMB_BITS)
            if _FORCE_UNROLL:  # per-limb scalar splats for Mosaic
                q = jnp.concatenate(
                    [(m * jnp.uint32(v))[None] for v in self.p_int[1:]],
                    axis=0)
            else:
                q = m[None] * p_col              # (15,*batch): m * p[1..15]
            mc = jnp.concatenate(
                [q[0:1] & MASK,
                 (q[1:] & MASK) + (q[:-1] >> LIMB_BITS),
                 q[-1:] >> LIMB_BITS], axis=0)   # (16,b) at window cols 1..16
            cols = jnp.concatenate([cols[1:] + mc, zero1], axis=0)  # shift out
            return (cols, carry), None

        cols0 = jnp.zeros((NLIMBS + 1,) + batch, dtype=jnp.uint32)
        carry0 = jnp.zeros(batch, dtype=jnp.uint32)
        if unroll or _FORCE_UNROLL:
            state = (cols0, carry0)
            for i in range(NLIMBS):
                state, _ = step(state, a[i])
        else:
            import jax
            state, _ = jax.lax.scan(step, (cols0, carry0), a)
        cols, carry = state
        res = jnp.concatenate([(cols[0] + carry)[None], cols[1:]], axis=0)
        out = _resolve_wide(res)[:NLIMBS]
        if not cond_sub:
            return out
        return self._cond_sub_p(out)

    def mul_many(self, pairs, unroll: bool = False, cond_sub: bool = True):
        """Batch k independent products into ONE mul instantiation.

        Graph-size lever for composite formulas (Jacobian add = 6 mul
        instantiations instead of 23): stacks along a new axis 1.
        """
        a = jnp.stack([p[0] for p in pairs], axis=1)
        b = jnp.stack([p[1] for p in pairs], axis=1)
        out = self.mul(a, b, unroll=unroll, cond_sub=cond_sub)
        return [out[:, k] for k in range(len(pairs))]

    def add_lazy(self, a: Elem, b: Elem) -> Elem:
        """a+b with canonical limbs but value possibly in [p, 2p).
        Valid as a `mul` input only (Karatsuba interior sums)."""
        s, _ = _split_resolve(a + b)
        return s

    # -- relaxed (lazy-reduction) domain: values in [0, 2p] ---------------------
    # The MSM hot path (ops/curve add_*_rx, ops/fused scan kernels) keeps
    # point coordinates as ANY representative of their residue in
    # [0, 2p], canonical 16-bit limbs. Montgomery muls then skip the
    # final conditional subtraction (cond_sub=False): for inputs
    # a <= alpha*p, b <= beta*p the CIOS output is
    #     out < (alpha*beta*p/R + 1) * p,   p/R = 0.18903,
    # so products of [0, 2p] values stay < 1.757p — the domain is closed
    # under mul with NO canonicalization. Linear ops below re-enter the
    # domain with ONE conditional subtraction of 2p. Residues are exact
    # (every value ≡ its canonical counterpart mod p); consumers must
    # not compare representatives bitwise (host conversions reduce
    # mod p; see prover host combine).

    def cond_sub_2p(self, s: Elem) -> Elem:
        """s < 4p, canonical limbs -> (s - 2p if s >= 2p else s) <= 2p."""
        t = self._limb_add_const(s, self._notp2_1np)
        red, ge = _resolve_ones(t & MASK, t >> LIMB_BITS)
        return jnp.where(ge[None], red, s)

    def add_rx(self, a: Elem, b: Elem) -> Elem:
        """a + b for a, b <= 2p -> <= 2p (sum < 4p, one cond_sub_2p)."""
        s, _ = _split_resolve(a + b)
        return self.cond_sub_2p(s)

    def dadd_rx(self, s: Elem, bound_p: float) -> Elem:
        """Resolve a DEFERRED sum of relaxed values (raw limb adds, each
        limb < 2^26) and re-enter [0, 2p]. `bound_p` is the trace-time
        value bound in units of p: the resolve needs < 2^256 = 5.2903p,
        the cond_sub needs < 4p."""
        assert bound_p < 4.0, bound_p
        return self.cond_sub_2p(_resolve_wide(s))

    def sub_rx(self, a: Elem, b: Elem) -> Elem:
        """a - b (mod p) for a, b <= 2p -> <= 2p.

        a + (~b) + (2p + 1) = (a - b + 2p) + 2^256; the top carry is
        structurally set (b <= 2p => a - b + 2p >= 0) and dropped by the
        wide resolve; a - b + 2p < 4p, so one cond_sub_2p lands in
        [0, 2p]."""
        s = a + (jnp.uint32(MASK) ^ b)
        return self.cond_sub_2p(
            _resolve_wide(self._limb_add_const(s, self._sub2p_np)))

    def neg_rx(self, a: Elem) -> Elem:
        """2p - a for a <= 2p: the relaxed negation (no cond_sub: the
        result is <= 2p already; a = 0 maps to the representative 2p)."""
        return _resolve_wide(self._limb_add_const(
            jnp.uint32(MASK) ^ a, self._sub2p_np))

    def sqr(self, a: Elem) -> Elem:
        return self.mul(a, a)

    def from_mont(self, a: Elem) -> Elem:
        """a * R^-1 (the reference's fromMontgomery, groth16.cpp:162)."""
        return self.mul(a, self.const(1, a.shape[1:]))

    def to_mont(self, a: Elem) -> Elem:
        return self.mul(a, self.const(self.r2, a.shape[1:]))

    def mul_plain_const(self, a: Elem, value: int) -> Elem:
        """a * value mod p for a plain-int constant (bakes value*R)."""
        return self.mul(a, self.const(value * self.r1 % self.modulus,
                                      a.shape[1:]))

    # -- wide reduction (for unreduced accumulator sums) ------------------------
    def reduce_wide(self, cols: Elem) -> Elem:
        """Reduce a deferred-carry accumulator of K >= 18 columns (column
        values < 2^31) to a canonical element.

        Used after limb-wise segment sums in the witness->polynomial
        accumulation — the TPU-idiomatic replacement for the reference's
        striped-lock scatter (groth16.cpp:63-85). value = lo + hi*2^256
        with hi < 2^(16(K-16)); lo mod p via Montgomery round trip, and
        hi*2^256 mod p = to_mont(hi).
        """
        out = []
        carry = jnp.zeros_like(cols[0])
        for k in range(cols.shape[0]):
            t = cols[k] + carry
            out.append(t & MASK)
            carry = t >> LIMB_BITS
        full = jnp.stack(out)  # carry-out is structurally zero at call sites
        lo = full[:NLIMBS]
        hi = jnp.zeros_like(lo)
        nhi = full.shape[0] - NLIMBS
        hi = hi.at[:nhi].set(full[NLIMBS:])
        lo_red = self.from_mont(self.to_mont(lo))  # maps any x<2^256 to x mod p
        hi_red = self.to_mont(hi)                  # hi * 2^256 mod p
        return self.add(lo_red, hi_red)


# Canonical instances for BN254.
from ..ref.field import P as _P, R_FR as _R  # noqa: E402

FQ = FieldOps(_P)
FR = FieldOps(_R)

# Relaxed-domain safety margins used by ops/curve *_rx formulas (exact
# integer checks of the bound algebra in the docstrings above):
#   * deferred 3*t with t a product of two <= 2p values stays < 2^256
#   * products of two <= 2p values stay <= 2p (domain closure)
_R256 = 1 << 256
_MUL22 = 4 * _P * _P // _R256 + _P          # mul bound for <= 2p inputs
assert 3 * _MUL22 < _R256                   # t0_3 resolve headroom
assert _MUL22 <= 2 * _P                     # closure under mul
