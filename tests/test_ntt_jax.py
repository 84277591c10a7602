"""JAX NTT vs the pure-Python spec (ref/ntt.py)."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from rapidsnark_tpu.ops import field as FF
from rapidsnark_tpu.ops.ntt import NTTPlan, coset_powers, ntt, to_odd_coset
from rapidsnark_tpu.ref import ntt as refntt
from rapidsnark_tpu.ref.field import R_FR, fr_w
from rapidsnark_tpu.utils.limbs import ints_to_limbs, limbs_to_ints

rng = random.Random(23)


def _dev(vals):
    return FF.unpack(jnp.asarray(ints_to_limbs(vals)))


def _host(x):
    return limbs_to_ints(np.asarray(FF.pack(x)))


def test_ntt_matches_spec():
    n = 16
    plan = NTTPlan(4)
    arrays = plan.arrays()
    a = [rng.randrange(R_FR) for _ in range(n)]
    got = _host(jax.jit(lambda x: ntt(x, arrays))(_dev(a)))
    assert got == refntt.fft(a)


def test_ntt_matches_spec_swapped_layout():
    # N=512: stages with half < 128 <= nblk take the swapped-orientation
    # butterfly layout (the anti-padding path, ops/ntt._apply_stage)
    n = 512
    plan = NTTPlan(9, with_coset=False)
    arrays = plan.arrays()
    a = [rng.randrange(R_FR) for _ in range(n)]
    got = _host(jax.jit(lambda x: ntt(x, arrays))(_dev(a)))
    assert got == refntt.fft(a)


def test_intt_roundtrip():
    n = 32
    plan = NTTPlan(5)
    arrays = plan.arrays()
    a = [rng.randrange(R_FR) for _ in range(n)]
    x = _dev(a)
    fwd = ntt(x, arrays)
    back = jax.jit(lambda y: ntt(y, arrays, inverse=True))(fwd)
    assert _host(back) == a
    assert _host(jax.jit(lambda y: ntt(y, arrays, inverse=True))(_dev(refntt.fft(a)))) == a


def test_coset_powers():
    v = fr_w(5)
    got = _host(coset_powers(v, 8))
    R = 1 << 256
    assert got == [pow(v, k, R_FR) * R % R_FR for k in range(8)]


def test_to_odd_coset_matches_reference_pipeline():
    """The exact groth16.cpp:101-155 composition on stored values."""
    n = 16
    plan = NTTPlan(4)
    arrays = plan.arrays()
    a = [rng.randrange(R_FR) for _ in range(n)]

    # spec: ifft; multiply by eta^k (plain factors); fft
    spec = refntt.ifft(a)
    eta = fr_w(5)
    spec = [spec[k] * pow(eta, k, R_FR) % R_FR for k in range(n)]
    spec = refntt.fft(spec)

    got = _host(jax.jit(lambda x: to_odd_coset(x, arrays, plan.eta))(_dev(a)))
    assert got == spec
