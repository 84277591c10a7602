"""Radix-2 NTT over BN254 Fr for TPU (JAX).

TPU-native replacement for ffiasm's FFT<Fr> (reference groth16.hpp:94,
groth16.cpp:99-155; SURVEY.md layer L2). Convention matches the
snarkjs/ffjavascript root chain exactly (see ref/ntt.py, the executable
spec): fft(a)[i] = sum_k a[k] w^(ik) with w = fr_w(log2 N), twiddles
stored in Montgomery form so the transform applies plain root factors
to stored values (SURVEY.md §3.1).

Layout: vectors are (16, *batch, N) uint32 (limb-major, N in lanes).
One DFT is a bit-reversal gather followed by a lax.fori_loop over the
log2(N) butterfly stages — the stage body is written uniformly over
lanes (partner index i XOR 2^s, twiddle index (i & (2^s-1)) << (logN-s-1),
add-vs-sub selected by bit s of the lane id), so the compiled graph
holds ONE mont_mul + ONE add + ONE sub regardless of N. Extra leading
batch axes (the prover transforms a/b/c together) ride the same
instantiations.

Twiddle tables are passed as runtime arrays (not baked constants):
`NTTPlan` precomputes them once per domain (the analogue of the
reference building FFT root tables at prover construction,
groth16.hpp:94), including the odd-coset shift table eta^k used by the
quotient-polynomial step (groth16.cpp:125-128).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..ref.field import R_FR, fr_w
from ..utils.limbs import ints_to_limbs
from .field import FR


def _bitrev_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev.astype(np.int32)


def _powers_mont(root: int, count: int) -> np.ndarray:
    """[mont(root^0), ..., mont(root^(count-1))] as (16, count) limbs."""
    vals, cur = [], 1
    for _ in range(count):
        vals.append(cur * (1 << 256) % R_FR)
        cur = cur * root % R_FR
    return ints_to_limbs(vals).T.copy()


class NTTPlan:
    """Precomputed tables for domain size N = 2^power (and the 2N coset
    shift used by the prover, groth16.cpp:125-128)."""

    def __init__(self, power: int, with_coset: bool = True):
        self.power = power
        self.n = 1 << power
        w = fr_w(power)
        winv = pow(w, -1, R_FR)
        half = max(self.n // 2, 1)

        self.fwd_tw = _powers_mont(w, half)
        self.inv_tw = _powers_mont(winv, half)
        mont = lambda x: x * (1 << 256) % R_FR  # noqa: E731
        self.ninv = ints_to_limbs([mont(pow(self.n, -1, R_FR))])[0]  # (16,)
        self.bitrev = _bitrev_indices(self.n)
        # eta = w_{2N}: the odd-coset shift (root(domainPower+1, i))
        self.eta = fr_w(power + 1)
        self.coset = (_powers_mont(self.eta, self.n) if with_coset
                      else None)  # (16, N)

    def arrays(self) -> Dict[str, np.ndarray]:
        out = {
            "fwd_tw": self.fwd_tw,
            "inv_tw": self.inv_tw,
            "ninv": self.ninv,
            "bitrev": self.bitrev,
        }
        if self.coset is not None:
            out["coset"] = self.coset
        return out


def _butterflies(x, tw):
    """log2(N) DIT stages after bit-reversal, ONE instantiation of each
    field op. x: (16, *batch, N); tw: (16, N/2) Montgomery twiddles."""
    n = x.shape[-1]
    tw = jnp.asarray(tw)
    stages = n.bit_length() - 1
    lane = jnp.arange(n, dtype=jnp.int32)
    logn = stages

    def stage(s, x):
        half = jnp.int32(1) << s
        partner = lane ^ half                       # i XOR 2^s
        lower = (lane & half) == 0
        k = (lane & (half - 1)) << (logn - 1 - s)   # twiddle exponent
        twl = jnp.broadcast_to(
            tw[:, k].reshape((16,) + (1,) * (x.ndim - 2) + (n,)), x.shape)
        xp = jnp.take(x, partner, axis=-1)  # plain gather: no index tensor
        from . import fused
        return fused.ntt_stage(x, xp, twl, lower)

    return jax.lax.fori_loop(0, stages, stage, x)


def ntt(x, arrays, inverse: bool = False):
    """DFT / inverse DFT on stored values. x: (16, *batch, N) uint32."""
    x = jnp.take(x, arrays["bitrev"], axis=-1)
    x = _butterflies(x, arrays["inv_tw"] if inverse else arrays["fwd_tw"])
    if inverse:
        ninv = jnp.broadcast_to(
            arrays["ninv"].reshape((16,) + (1,) * (x.ndim - 1)), x.shape)
        x = FR.mul(x, ninv)
    return x


def coset_powers(value: int, n: int):
    """Device-built vector [1, v, v^2, ..., v^(n-1)] in Montgomery form,
    via log2(n) doubling concats (host-free alternative to the plan's
    precomputed coset table)."""
    out = FR.one_mont((1,))
    size = 1
    cur_plain = value % R_FR
    while size < n:
        c = FR.const(cur_plain * (1 << 256) % R_FR, (size,))  # mont(v^size)
        out = jnp.concatenate([out, FR.mul(out, c)], axis=1)
        cur_plain = cur_plain * cur_plain % R_FR
        size *= 2
    return out


def to_odd_coset(x, arrays, eta: int = 0):
    """ifft -> multiply element k by eta^k -> fft (groth16.cpp:101-155):
    maps evaluations on H to evaluations on the odd 2N-th roots coset.
    x: (16, *batch, N). Uses the plan's precomputed coset table when
    present, else builds powers of `eta` on device."""
    x = ntt(x, arrays, inverse=True)
    n = x.shape[-1]
    shift = arrays.get("coset")
    if shift is None:
        shift = coset_powers(eta, n)
    shift = jnp.broadcast_to(
        shift.reshape((16,) + (1,) * (x.ndim - 2) + (n,)), x.shape)
    x = FR.mul(x, shift)
    return ntt(x, arrays)
