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
        # (1/N * eta^k) permuted to bit-reversed positions: the middle
        # factor of the gather-free DIF -> mul -> DIT coset pipeline
        # (to_odd_coset), folding the ifft's 1/N scale into the same mul
        if with_coset:
            ninv_i = pow(self.n, -1, R_FR)
            vals, cur = [], 1
            for _ in range(self.n):
                vals.append(cur * ninv_i % R_FR * (1 << 256) % R_FR)
                cur = cur * self.eta % R_FR
            import numpy as _np
            tbl = ints_to_limbs(vals).T.copy()           # (16, N) natural
            self.coset_ninv_br = _np.ascontiguousarray(
                tbl[:, self.bitrev])                     # (16, N) bitrev
        else:
            self.coset_ninv_br = None

    def arrays(self) -> Dict[str, np.ndarray]:
        out = {
            "fwd_tw": self.fwd_tw,
            "inv_tw": self.inv_tw,
            "ninv": self.ninv,
            "bitrev": self.bitrev,
        }
        if self.coset is not None:
            out["coset"] = self.coset
        if self.coset_ninv_br is not None:
            out["coset_ninv_br"] = self.coset_ninv_br
        return out


def _unpack_rows(a):
    """(8, ...) packed twiddle rows -> (16, ...) limbs (tables may be
    stored PACKED to halve their HBM residency; ops/msm.pack_limb_rows
    layout)."""
    if a.shape[0] == 16:
        return a
    from .msm import unpack_limb_rows
    return unpack_limb_rows(a)


def _apply_stage(x, tw, half: int, stride: int, dif: bool):
    """One butterfly layer: pairs (lane, lane XOR half) by STATIC
    reshape, never a gather. When half is below the 128-lane tile, the
    (nblk, 2, half) view is swapped to (half, 2, nblk) so the trailing
    axis stays tile-sized — small trailing axes get up to 8x layout
    padding on TPU, which OOMs 2^22-scale transforms."""
    from . import fused
    n = x.shape[-1]
    nblk = n // (2 * half)
    bshape = x.shape[:-1]
    tws = _unpack_rows(tw[:, ::stride][:, :half])  # (16, half)
    xv = x.reshape(bshape + (nblk, 2, half))
    swap = half < 128 <= nblk
    if swap:
        xv = jnp.swapaxes(xv, -1, -3)            # (..., half, 2, nblk)
    lo, hi = xv[..., 0, :], xv[..., 1, :]
    if swap:
        shape = (16,) + (1,) * (lo.ndim - 3) + (half, 1)
    else:
        shape = (16,) + (1,) * (lo.ndim - 2) + (half,)
    twl = jnp.broadcast_to(tws.reshape(shape), lo.shape)
    lo, hi = fused.ntt_butterfly(lo, hi, twl, dif=dif)
    y = jnp.stack([lo, hi], axis=-2)
    if swap:
        y = jnp.swapaxes(y, -1, -3)
    return y.reshape(bshape + (n,))


def _tail_stages(n: int) -> int:
    """How many half<128 stages to fuse into ONE ops/fused.ntt_tail
    kernel (TPU only): avoids the (…, nblk, 2, half) views whose
    16-lane trailing axes get 8x layout padding (an 8 GB HLO temp per
    2^24 poly — the round-3 front OOM) and keeps those stages in VMEM."""
    from . import fused
    logn = n.bit_length() - 1
    if not fused.enabled() or n < (1 << 12):
        return 0
    return min(7, logn)  # halves 1..64


def _tail_tws(tw, n: int, k: int):
    """{half: (16, half)} twiddle rows for the k smallest-half stages."""
    return {1 << s: _unpack_rows(tw[:, ::(n >> (s + 1))][:, :1 << s])
            for s in range(k)}


def _stages_dit(x, tw):
    """Decimation-in-time stages: BIT-REVERSED input -> natural output.
    x: (16, *batch, N); tw: (16, N/2) Montgomery twiddles. half<128
    stages run fused in one VMEM kernel; the rest are one fused
    butterfly kernel over n/2 lanes each (ops/fused.py)."""
    from . import fused
    n = x.shape[-1]
    logn = n.bit_length() - 1
    tw = jnp.asarray(tw)
    k0 = _tail_stages(n)
    if k0:
        x = fused.ntt_tail(x, _tail_tws(tw, n, k0), dif=False)
    for s in range(k0, logn):
        x = _apply_stage(x, tw, 1 << s, 1 << (logn - 1 - s), dif=False)
    return x


def _stages_dif(x, tw):
    """Decimation-in-frequency stages: natural input -> BIT-REVERSED
    output. With inverse twiddles this is the unscaled inverse DFT —
    DIF + (elementwise work) + DIT composes with NO bit-reversal
    permutations at all (the coset pipeline below)."""
    from . import fused
    n = x.shape[-1]
    logn = n.bit_length() - 1
    tw = jnp.asarray(tw)
    k0 = _tail_stages(n)
    for k in range(logn - k0):
        x = _apply_stage(x, tw, 1 << (logn - 1 - k), 1 << k, dif=True)
    if k0:
        x = fused.ntt_tail(x, _tail_tws(tw, n, k0), dif=True)
    return x


def ntt(x, arrays, inverse: bool = False):
    """DFT / inverse DFT on stored values. x: (16, *batch, N) uint32."""
    x = jnp.take(x, arrays["bitrev"], axis=-1)
    x = _stages_dit(x, arrays["inv_tw"] if inverse else arrays["fwd_tw"])
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
    x: (16, *batch, N).

    With the plan's coset_ninv_br table this runs the gather-free form:
    DIF stages (natural -> bitrev, unscaled inverse), ONE fused multiply
    by (1/N * eta^k) at bit-reversed positions, DIT stages (bitrev ->
    natural) — no bit-reversal permutations, no per-stage gathers.
    Without the table (device-built eta powers), falls back to two
    full ntt() calls."""
    n = x.shape[-1]
    shift_br = arrays.get("coset_ninv_br")
    if shift_br is None:
        x = ntt(x, arrays, inverse=True)
        shift = arrays.get("coset")
        if shift is None:
            shift = coset_powers(eta, n)
        shift = jnp.broadcast_to(
            shift.reshape((16,) + (1,) * (x.ndim - 2) + (n,)), x.shape)
        x = FR.mul(x, shift)
        return ntt(x, arrays)
    x = _stages_dif(x, arrays["inv_tw"])
    ch = 1 << 22
    if x.ndim == 2 and n > ch:
        # chunk the full-width shift mul — at 2^24 one (16, N) mont_mul
        # holds ~200 B/lane of CIOS temporaries (HBM; prover.py front)
        import jax
        x = jax.lax.map(
            lambda args: FR.mul(args[0], _unpack_rows(args[1])),
            (jnp.moveaxis(x.reshape(16, n // ch, ch), 1, 0),
             jnp.moveaxis(shift_br.reshape(
                 shift_br.shape[0], n // ch, ch), 1, 0)))
        x = jnp.moveaxis(x, 0, 1).reshape(16, n)
    else:
        shift = jnp.broadcast_to(_unpack_rows(shift_br).reshape(
            (16,) + (1,) * (x.ndim - 2) + (n,)), x.shape)
        x = FR.mul(x, shift)
    return _stages_dit(x, arrays["fwd_tw"])
