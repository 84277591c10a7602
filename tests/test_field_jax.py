"""JAX limb field kernels vs Python-int golden arithmetic."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from rapidsnark_tpu.ops import field as FF
from rapidsnark_tpu.ref.field import P, R_FR
from rapidsnark_tpu.utils.limbs import ints_to_limbs, limbs_to_ints

rng = random.Random(7)


def _rand_elems(n, mod):
    xs = [rng.randrange(mod) for _ in range(n - 4)]
    # adversarial edge values
    xs += [0, 1, mod - 1, mod - 2]
    return xs


def _run(op, fo, *int_args):
    limb_args = [FF.unpack(jnp.asarray(ints_to_limbs(a))) for a in int_args]
    out = jax.jit(lambda *ls: FF.pack(op(*ls)))(*limb_args)
    return limbs_to_ints(np.asarray(out))


def _check_binop(fo, op, golden, mod, n=32):
    a = _rand_elems(n, mod)
    b = list(reversed(_rand_elems(n, mod)))
    got = _run(op, fo, a, b)
    expect = [golden(x, y) for x, y in zip(a, b)]
    assert got == expect


def test_add_mod():
    for fo, mod in ((FF.FQ, P), (FF.FR, R_FR)):
        _check_binop(fo, fo.add, lambda x, y: (x + y) % mod, mod)


def test_sub_mod():
    for fo, mod in ((FF.FQ, P), (FF.FR, R_FR)):
        _check_binop(fo, fo.sub, lambda x, y: (x - y) % mod, mod)


def test_mont_mul():
    rinv_q = pow(1 << 256, -1, P)
    rinv_r = pow(1 << 256, -1, R_FR)
    _check_binop(FF.FQ, FF.FQ.mul, lambda x, y: x * y * rinv_q % P, P)
    _check_binop(FF.FR, FF.FR.mul, lambda x, y: x * y * rinv_r % R_FR, R_FR)


def test_mont_roundtrip():
    xs = _rand_elems(16, P)
    got = _run(lambda a: FF.FQ.from_mont(FF.FQ.to_mont(a)), FF.FQ, xs)
    assert got == xs


def test_mul_is_mont_domain_product():
    """to_mont(x) (*) to_mont(y) == to_mont(x*y)."""
    xs = _rand_elems(8, P)
    ys = list(reversed(_rand_elems(8, P)))
    xm = [x * (1 << 256) % P for x in xs]
    ym = [y * (1 << 256) % P for y in ys]
    got = _run(FF.FQ.mul, FF.FQ, xm, ym)
    assert got == [x * y % P * (1 << 256) % P for x, y in zip(xs, ys)]


def test_neg_and_predicates():
    xs = _rand_elems(8, R_FR)
    got = _run(FF.FR.neg, FF.FR, xs)
    assert got == [(-x) % R_FR for x in xs]

    a = FF.unpack(jnp.asarray(ints_to_limbs([0, 5, R_FR - 1])))
    z = np.asarray(FF.FR.is_zero(a))
    assert z.tolist() == [True, False, False]


def test_reduce_wide_segment_sum():
    """Limb-wise unreduced sums reduce to the true modular sum."""
    groups = [[rng.randrange(R_FR) for _ in range(k)] for k in (1, 7, 300)]
    # build deferred accumulators: plain limb-wise u32 sums, 18 columns
    accs = []
    for g in groups:
        cols = [0] * 18
        for v in g:
            for i in range(16):
                cols[i] += (v >> (16 * i)) & 0xFFFF
        accs.append(cols)
    cols_arr = jnp.asarray(
        np.array([[a[i] for a in accs] for i in range(18)], dtype=np.uint32))
    out = jax.jit(lambda c: FF.pack(FF.FR.reduce_wide(c)))(cols_arr)
    assert limbs_to_ints(np.asarray(out)) == [sum(g) % R_FR for g in groups]


def test_unrolled_kogge_stone_matches_scan():
    """The TPU/Pallas formulation (unrolled CIOS + Kogge-Stone carries)
    computes the same values as the CPU scan-ripple path — keeps the
    kernel-mode arithmetic covered even when the suite runs on CPU."""
    fo, mod = FF.FQ, P  # FQ mul+sub exercise every resolver/const path
    a = _rand_elems(16, mod)
    b = list(reversed(_rand_elems(16, mod)))

    def unrolled(op):
        def run(x, y):
            with FF.force_unroll():
                return op(x, y)
        return run

    for op in (fo.mul, fo.sub):
        got_scan = _run(op, fo, a, b)
        got_ks = _run(unrolled(op), fo, a, b)
        assert got_ks == got_scan


def test_batch_shapes_2d():
    """Ops broadcast over arbitrary leading dims."""
    xs = np.array(ints_to_limbs(_rand_elems(12, P))).reshape(3, 4, 16)
    a = FF.unpack(jnp.asarray(xs))
    out = FF.pack(FF.FQ.add(a, a))
    assert out.shape == (3, 4, 16)
    got = limbs_to_ints(np.asarray(out))
    expect = [(x * 2) % P for x in limbs_to_ints(xs)]
    assert got == expect
