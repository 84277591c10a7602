"""Radix-2 NTT over BN254 Fr for TPU (JAX).

TPU-native replacement for ffiasm's FFT<Fr> (reference groth16.hpp:94,
groth16.cpp:99-155; SURVEY.md layer L2). Convention matches the
snarkjs/ffjavascript root chain exactly (see ref/ntt.py, the executable
spec): fft(a)[i] = sum_k a[k] w^(ik) with w = fr_w(log2 N), twiddles
stored in Montgomery form so the transform applies plain root factors
to stored values (SURVEY.md §3.1).

Layout: vectors are (16, N) uint32 (limb-major, N in lanes). One DFT is
a bit-reversal gather + log2(N) butterfly stages; each stage is one
batched mont_mul + modular add/sub on (16, nblocks, half) views — the
whole transform is ~log2(N) mul instantiations.

Twiddle tables are passed as runtime arrays (not baked constants):
`NTTPlan` precomputes them once per domain (the analogue of the
reference building FFT root tables at prover construction,
groth16.hpp:94).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from ..ref.field import R_FR, fr_w
from ..utils.limbs import ints_to_limbs
from . import field as FF
from .field import FR


def _bitrev_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev.astype(np.int32)


class NTTPlan:
    """Precomputed tables for domain size N = 2^power (and the 2N coset
    shift used by the prover, groth16.cpp:125-128)."""

    def __init__(self, power: int):
        self.power = power
        self.n = 1 << power
        w = fr_w(power)
        winv = pow(w, -1, R_FR)
        half = self.n // 2
        mont = lambda x: x * (1 << 256) % R_FR  # noqa: E731

        def table(root):
            vals, cur = [], 1
            for _ in range(half):
                vals.append(mont(cur))
                cur = cur * root % R_FR
            return ints_to_limbs(vals).T.copy()  # (16, half)

        self.fwd_tw = table(w)
        self.inv_tw = table(winv)
        self.ninv = ints_to_limbs([mont(pow(self.n, -1, R_FR))])[0]  # (16,)
        self.bitrev = _bitrev_indices(self.n)
        # eta = w_{2N}: the odd-coset shift (root(domainPower+1, i))
        self.eta = fr_w(power + 1)

    def arrays(self) -> Dict[str, np.ndarray]:
        return {
            "fwd_tw": self.fwd_tw,
            "inv_tw": self.inv_tw,
            "ninv": self.ninv,
            "bitrev": self.bitrev,
        }


def _butterflies(x, tw):
    """log2(N) DIT stages after bit-reversal. x: (16, N), tw: (16, N/2)."""
    n = x.shape[1]
    stages = n.bit_length() - 1
    for s in range(stages):
        length = 2 << s            # current block length
        half = 1 << s
        nblocks = n // length
        xb = x.reshape(16, nblocks, 2, half)
        u = xb[:, :, 0]
        v = xb[:, :, 1]
        stride = n // length
        twk = tw[:, ::stride][:, None, :]  # (16, 1, half)
        vw = FR.mul(v, jnp.broadcast_to(twk, v.shape))
        x = jnp.concatenate([FR.add(u, vw)[:, :, None],
                             FR.sub(u, vw)[:, :, None]], axis=2)
        x = x.reshape(16, n)
    return x


def ntt(x, arrays, inverse: bool = False):
    """DFT / inverse DFT on stored values. x: (16, N) uint32."""
    x = x[:, arrays["bitrev"]]
    x = _butterflies(x, arrays["inv_tw"] if inverse else arrays["fwd_tw"])
    if inverse:
        ninv = jnp.broadcast_to(arrays["ninv"][:, None], x.shape)
        x = FR.mul(x, ninv)
    return x


def coset_powers(value: int, n: int):
    """Device-built vector [1, v, v^2, ..., v^(n-1)] in Montgomery form,
    via log2(n) doubling concats (avoids a second N-sized host table)."""
    out = FR.one_mont((1,))
    size = 1
    cur_plain = value % R_FR
    while size < n:
        c = FR.const(cur_plain * (1 << 256) % R_FR, (size,))  # mont(v^size)
        out = jnp.concatenate([out, FR.mul(out, c)], axis=1)
        cur_plain = cur_plain * cur_plain % R_FR
        size *= 2
    return out


def to_odd_coset(x, arrays, eta: int):
    """ifft -> multiply element k by eta^k -> fft (groth16.cpp:101-155):
    maps evaluations on H to evaluations on the odd 2N-th roots coset."""
    x = ntt(x, arrays, inverse=True)
    shift = coset_powers(eta, x.shape[1])
    x = FR.mul(x, shift)
    return ntt(x, arrays)
