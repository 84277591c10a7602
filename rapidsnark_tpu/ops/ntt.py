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


# --- whole-transform pass fusion (round 4) ---------------------------------
# All log2(N) butterfly stages run in ceil((logN - _CB) / 3) fused
# Pallas passes (ops/fused.ntt_fused_pass): the bottom pass carries the
# _CB lane stages plus 3 "row" stages along an 8-extent second-minor
# axis; every further pass carries up to 3 more row stages on a free
# reshape VIEW (minor dim stays >= 2^_CB, second-minor is always 8, so
# the (8, 128) tiling never relayouts). At 2^22 this is 4 HBM round
# trips per transform instead of 15 stage kernels + their slice/stack
# copies. The per-stage path below remains for small N / the fallback.

# lane bits per fused bottom pass (Cp = 2^_CB lanes). The bottom pass
# holds ~11 full-width (16, 8, Cp) mont_mul temporaries live at once:
# Cp = 2048 needs ~42 MB of scoped VMEM and FAILS Mosaic's 16 MB limit
# on v5e (measured round 4); Cp = 512 fits (~10 MB) at the cost of one
# extra axis pass per transform.
import os as _os

_CB = int(_os.environ.get("RSTPU_NTT_CB", "9"))


def _fuse_enabled(n: int) -> bool:
    import os
    v = os.environ.get("RSTPU_NTT_FUSE")
    if v is not None:
        return v != "0"
    from . import fused
    return fused.enabled() and n >= (1 << (_CB + 3))


def _fuse_groups(logn: int):
    """Bottom-up (axis_offset, [stage bits]) groups covering bits
    _CB..logn-1; bits below _CB ride the bottom pass as lane stages.
    A ragged top group reuses the axis at logn-3 (its lower bits are
    simply not touched)."""
    groups = []
    lo = _CB
    while lo + 3 <= logn:
        groups.append((lo, [lo, lo + 1, lo + 2]))
        lo += 3
    if lo < logn:
        groups.append((logn - 3, list(range(lo, logn))))
    return groups


def _axis_desc(tw, n, bit, offset):
    h = 1 << bit
    s = n // (2 * h)
    k = bit - offset
    t = _unpack_rows(tw[:, ::s][:, :h])
    return {"kind": "axis", "k": k,
            "tw": t.reshape(16, 1 << k, 1 << offset)}


def _lane_desc(tw, n, bit, blk):
    h = 1 << bit
    s = n // (2 * h)
    t = _unpack_rows(tw[:, ::s][:, :h])
    return {"kind": "split" if h >= 128 else "roll", "half": h,
            "tw": jnp.tile(t, (1, blk // h))}


def _fused_transform(x, tw, dif: bool, pre_mul=None):
    """x: (16, *batch, N); pre_mul: optional (rows, N) table folded in
    elementwise before the first executed stage (DIT only — the coset
    shift fold; rows == 8 means packed pairs)."""
    from . import fused
    n = x.shape[-1]
    logn = n.bit_length() - 1
    bshape = x.shape[1:-1]
    b = 1
    for d in bshape:
        b *= d
    flat = x.reshape(16, b, n)
    tw = jnp.asarray(tw)
    groups = _fuse_groups(logn)
    cp = 1 << _CB

    def bottom_descs():
        bits = groups[0][1]
        lanes = list(range(_CB))
        if dif:
            return ([_axis_desc(tw, n, bb, _CB)
                     for bb in sorted(bits, reverse=True)]
                    + [_lane_desc(tw, n, bb, cp)
                       for bb in sorted(lanes, reverse=True)])
        return ([_lane_desc(tw, n, bb, cp) for bb in sorted(lanes)]
                + [_axis_desc(tw, n, bb, _CB) for bb in sorted(bits)])

    def run(flat, o, descs, pm=None):
        v = flat.reshape(16, b * (n >> (o + 3)), 8, 1 << o)
        if pm is not None:
            pm = pm.reshape(pm.shape[0], n >> (_CB + 3), 8, cp)
        v = fused.ntt_fused_pass(v, descs, dif, pre_mul=pm)
        return v.reshape(16, b, n)

    if dif:
        for o, bits in reversed(groups[1:]):
            flat = run(flat, o, [_axis_desc(tw, n, bb, o)
                                 for bb in sorted(bits, reverse=True)])
        flat = run(flat, _CB, bottom_descs())
    else:
        flat = run(flat, _CB, bottom_descs(), pm=pre_mul)
        for o, bits in groups[1:]:
            flat = run(flat, o, [_axis_desc(tw, n, bb, o)
                                 for bb in sorted(bits)])
    return flat.reshape(x.shape)


def _stages_dit(x, tw, pre_mul=None):
    """Decimation-in-time stages: BIT-REVERSED input -> natural output.
    x: (16, *batch, N); tw: (16, N/2) Montgomery twiddles. Fused-pass
    path for N >= 2^14 on TPU; otherwise half<128 stages run fused in
    one VMEM kernel and the rest are one butterfly kernel each.
    pre_mul: optional (rows, N) elementwise factor applied first (the
    coset pipeline's shift, folded into the first kernel pass)."""
    from . import fused
    n = x.shape[-1]
    if _fuse_enabled(n):
        return _fused_transform(x, tw, dif=False, pre_mul=pre_mul)
    if pre_mul is not None:
        shift = jnp.broadcast_to(_unpack_rows(pre_mul).reshape(
            (16,) + (1,) * (x.ndim - 2) + (n,)), x.shape)
        x = FR.mul(x, shift)
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
    if _fuse_enabled(n):
        return _fused_transform(x, tw, dif=True)
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
    if _fuse_enabled(n):
        # the shift mul rides the DIT's first fused pass as a pre_mul
        # input — no separate full-width round trip, no chunking
        return _stages_dit(x, arrays["fwd_tw"], pre_mul=shift_br)
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
