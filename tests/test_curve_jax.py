"""RCB complete projective group law (the production path) vs the
pure-Python ref oracle — G1 and G2, general/mixed adds, doubling,
cancellation, and infinity lanes."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from rapidsnark_tpu.ops import field as FF
from rapidsnark_tpu.ops.curve import FQ2, G1P, G2P
from rapidsnark_tpu.ref import curve as refc
from rapidsnark_tpu.ref.field import R_FR
from rapidsnark_tpu.utils.limbs import ints_to_limbs
from rapidsnark_tpu.utils import points as PT

rng = random.Random(11)


def _ref_g1_points(n):
    return [refc.G1.mul(refc.G1_GEN, rng.randrange(1, R_FR)) for _ in range(n)]


def _ref_g2_points(n):
    return [refc.G2.mul(refc.G2_GEN, rng.randrange(1, R_FR)) for _ in range(n)]


def _aff_g1(pts):
    """ref points -> device affine (x, y) limb pair; (0,0) = infinity."""
    arr = np.stack([PT.g1_affine_to_mont_limbs(p) for p in pts])  # (n,2,16)
    return (FF.unpack(jnp.asarray(arr[:, 0])), FF.unpack(jnp.asarray(arr[:, 1])))


def _dev_g1(pts):
    return G1P.from_affine(*_aff_g1(pts))


def _aff_g2(pts):
    arr = np.stack([PT.g2_affine_to_mont_limbs(p) for p in pts])  # (n,4,16)
    cs = [FF.unpack(jnp.asarray(arr[:, k])) for k in range(4)]
    return ((cs[0], cs[1]), (cs[2], cs[3]))


def _dev_g2(pts):
    return G2P.from_affine(*_aff_g2(pts))


def _host_g1p(proj):
    """Projective (RCB) device point(s) -> ref affine."""
    x, y, z = proj
    xs, ys, zs = (np.asarray(FF.pack(c)) for c in (x, y, z))
    if xs.ndim == 1:
        return PT.proj_to_affine_g1(xs, ys, zs)
    return [PT.proj_to_affine_g1(xs[i], ys[i], zs[i])
            for i in range(len(xs))]


def _host_g2p(proj):
    x, y, z = proj

    def cc(e):
        return (np.asarray(FF.pack(e[0])), np.asarray(FF.pack(e[1])))

    xs, ys, zs = cc(x), cc(y), cc(z)
    if xs[0].ndim == 1:
        return PT.proj_to_affine_g2(xs, ys, zs)
    return [PT.proj_to_affine_g2((xs[0][i], xs[1][i]),
                                 (ys[0][i], ys[1][i]),
                                 (zs[0][i], zs[1][i]))
            for i in range(len(xs[0]))]


def _adversarial_g1(n=8):
    """Point batches covering P+P, P+(-P), P+O, O+Q, O+O lanes."""
    ps = _ref_g1_points(n)
    qs = _ref_g1_points(n)
    ps[0] = qs[0]
    qs[1] = refc.G1.neg(ps[1])
    qs[2] = None
    ps[3] = None
    ps[4] = None
    qs[4] = None
    return ps, qs


def test_g1_add_and_mixed_vs_ref():
    ps, qs = _adversarial_g1()
    for got in (_host_g1p(jax.jit(lambda a, b: G1P.add(a, b))(
                    _dev_g1(ps), _dev_g1(qs))),
                _host_g1p(jax.jit(lambda a, b: G1P.add_mixed(a, b))(
                    _dev_g1(ps), _aff_g1(qs)))):
        for g, p, q in zip(got, ps, qs):
            e = refc.G1.add(p, q)
            assert (g is None and e is None) or refc.G1.eq(g, e)


def test_g1_double_vs_ref():
    ps = _ref_g1_points(4) + [None]
    got = _host_g1p(jax.jit(G1P.double)(_dev_g1(ps)))
    for g, p in zip(got, ps):
        e = refc.G1.double(p)
        assert (g is None and e is None) or refc.G1.eq(g, e)


def test_g2_add_mixed_double_vs_ref():
    n = 6
    ps = _ref_g2_points(n)
    qs = _ref_g2_points(n)
    ps[0] = qs[0]                # doubling lane
    qs[1] = refc.G2.neg(ps[1])   # cancellation lane
    qs[2] = None
    ps[3] = None
    for got in (_host_g2p(jax.jit(lambda a, b: G2P.add(a, b))(
                    _dev_g2(ps), _dev_g2(qs))),
                _host_g2p(jax.jit(lambda a, b: G2P.add_mixed(a, b))(
                    _dev_g2(ps), _aff_g2(qs)))):
        for g, p, q in zip(got, ps, qs):
            e = refc.G2.add(p, q)
            assert (g is None and e is None) or refc.G2.eq(g, e)

    got2 = _host_g2p(jax.jit(G2P.double)(_dev_g2(ps)))
    for g, p in zip(got2, ps):
        e = refc.G2.double(p)
        assert (g is None and e is None) or refc.G2.eq(g, e)


def test_fused_pallas_adders_match_xla(monkeypatch):
    """ops/fused.py kernels (interpret mode on CPU) == the XLA path."""
    from rapidsnark_tpu.ops import fused
    monkeypatch.setenv("RSTPU_PALLAS", "1")
    fused.enabled.cache_clear()
    try:
        n = 512
        rs = np.random.RandomState(5)
        leaf = lambda: jnp.asarray(  # noqa: E731
            rs.randint(0, 1 << 16, size=(16, n), dtype=np.uint32))
        p = (leaf(), leaf(), leaf())
        q = (leaf(), leaf(), leaf())
        got = fused.add(G1P, p, q)
        # fused.add runs the relaxed law on G1 — compare against the
        # SAME formula through plain XLA (bitwise: identical graphs)
        from rapidsnark_tpu.ops.curve import relaxed_for
        fn = G1P.add_rx if relaxed_for(G1P) else G1P.add
        want = jax.jit(fn)(p, q)
        for g, w in zip(got, want):
            assert np.array_equal(np.asarray(g), np.asarray(w))
        qa = (leaf(), leaf())
        got = fused.add_mixed(G1P, p, qa)
        want = jax.jit(lambda a, b: G1P.add_mixed(a, b))(p, qa)
        for g, w in zip(got, want):
            assert np.array_equal(np.asarray(g), np.asarray(w))
    finally:
        fused.enabled.cache_clear()


def test_fq2_mul_matches_ref():
    from rapidsnark_tpu.ref.field import fq2_mul, P as PMOD
    a = (rng.randrange(PMOD), rng.randrange(PMOD))
    b = (rng.randrange(PMOD), rng.randrange(PMOD))
    R = 1 << 256

    def to_dev(v):
        return tuple(FF.unpack(jnp.asarray(ints_to_limbs([c * R % PMOD])[0]))
                     for c in v)

    out = jax.jit(FQ2.mul)(to_dev(a), to_dev(b))
    got = tuple(PT._coord(np.asarray(FF.pack(c))) for c in out)
    assert got == fq2_mul(a, b)
