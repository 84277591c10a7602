"""Pippenger multi-scalar multiplication for TPU (JAX/XLA).

TPU-native replacement for ffiasm's `multiMulByScalar` (reference
depends/ffiasm/c/multiexp.cpp, called at /root/reference/src/groth16.cpp:
173-204; SURVEY.md §2.12, §3.1 [HOT]). The reference parallelizes bucket
accumulation over OpenMP threads with per-thread bucket tables; that
design (data-dependent scatter into buckets) is hostile to XLA's static
dataflow, so the TPU formulation is different:

For each c-bit window:
  1. digit extraction   — d_i = c-bit slice of scalar_i (vectorized),
  2. sort by digit      — one XLA sort per window (argsort + gather),
  3. prefix scan        — running group sums PS(k) = P'_0 + ... + P'_{k-1}
     of the sorted points, computed with the branch-free *complete*
     Jacobian adder (ops/curve.py) as combiner: a lax.scan over chunk
     columns (C-step sequential, n/C lanes wide) plus a roll-based
     Hillis-Steele pass over chunk totals — 2 adder instantiations total,
  4. window total       — with A_j = PS(cum_j) (cum_j counts digits
     <= j), sum_j j*B_j TELESCOPES to sum_{j<M} (A_M - A_j): one
     boundary gather-add per bucket, one wide difference, one pairwise
     halving tree — bucket sums are never materialized and no scatter
     ever happens.

Windows are *batched on a vector axis* (leaves (16, G, n)) and processed
in groups of G via lax.scan, so the sequential chunk scan is paid once
per group, not once per window. Window results combine with a 256-step
double-and-add ladder (1 double + 1 add instantiation).

Work per window ~ n complete adds (same as classical Pippenger's bucket
phase) but with full lane parallelism and no locks; all shapes static.

Scalars are consumed as plain little-endian 256-bit integers of
sizeof(FrElement) bytes, exactly like the reference (SURVEY.md §3.1
"MSM consumes scalars as plain little-endian integers").
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .curve import CurveOps, G1P, G2P, _map_leaves, _shape_of

SCALAR_BITS = 256
_CHUNK = 256  # columns of the sequential chunk scan
# columns fused per scan kernel (the accumulator stays in VMEM across
# them); measured optima at 2^18 on v5e with 128-lane scan blocks
# (round-2 sweep: G1 1615->1229 ms, G2 1397->991 ms vs the round-1
# 512-lane/K=2/4 schedule — small blocks pipeline better across the
# grid; see PERF.md)
_SCAN_COLS_G1 = 1
_SCAN_COLS_G2 = 2


@functools.cache
def _scan_cols(is_g2: bool) -> int:
    """Adder instantiations per scan step. On CPU (tests/dryrun) each
    extra column is one more ~2-6s XLA compile of the complete adder
    with zero benefit (no VMEM/launch economics): keep 1.
    RSTPU_SCAN_COLS_G1/_G2 override for tuning."""
    import os
    env = os.environ.get("RSTPU_SCAN_COLS_G2" if is_g2
                         else "RSTPU_SCAN_COLS_G1")
    if env:
        return int(env)
    if jax.default_backend() == "cpu":
        return 1
    return _SCAN_COLS_G2 if is_g2 else _SCAN_COLS_G1


# ---------------------------------------------------------------------------
# point pytree helpers (leaves are (16, *batch) uint32 limb arrays;
# PACKED affine tables use (8, *batch) with two 16-bit limbs per word)
# ---------------------------------------------------------------------------

def pack_limb_rows(a):
    """(16, ...) u32 16-bit-payload limbs -> (8, ...) packed pairs.

    Affine point tables are stored and GATHERED in this layout: the
    sort-permutation gather is bandwidth-bound, and half the bytes of
    the unpacked layout are zeros. Works on numpy and jnp arrays."""
    return a[0::2] | (a[1::2] << 16)


def unpack_limb_rows(a):
    """(8, ...) packed pairs -> (16, ...) limbs. Written as 16 static
    slices + one concat so the same code runs inside Pallas kernel
    bodies (Mosaic has no interleaving reshape over sublanes)."""
    mask = jnp.uint32(0xFFFF)
    parts = []
    for j in range(a.shape[0]):
        parts.append(a[j:j + 1] & mask)
        parts.append(a[j:j + 1] >> 16)
    return jnp.concatenate(parts, axis=0)


def _pt_map(pt, fn):
    return tuple(_map_leaves(c, fn) for c in pt)


def _add(curve: CurveOps, p, q):
    """Complete add through the fused Pallas kernel when enabled."""
    from . import fused
    return fused.add(curve, p, q)


def _add_mixed_packed(curve: CurveOps, p, q):
    """Jacobian + PACKED affine add through the fused Pallas kernel
    (the kernel unpacks the affine columns in VMEM)."""
    from . import fused
    return fused.add_mixed_packed(curve, p, q)


def _gather_last(a, idx, nbatch_a: int):
    """a: (16, *batchA, n); idx: (*extra, *batchA, m) -> gathered
    (16, *extra, *batchA, m) via advanced indexing (4-5x faster on TPU
    than broadcasting an index tensor into take_along_axis)."""
    off = idx.ndim - 1 - nbatch_a
    ind = [jax.lax.broadcasted_iota(jnp.int32, idx.shape, off + d)
           for d in range(nbatch_a)]
    return a[(slice(None), *ind, idx)]


def _pt_take_last(pt, idx):
    """Gather along the last (lane) axis with a batch-shaped index array
    (idx batch == point batch)."""
    return _pt_map(pt, lambda a: _gather_last(a, idx, a.ndim - 2))


# ---------------------------------------------------------------------------
# prefix machinery
# ---------------------------------------------------------------------------

def _hillis_prefix(curve: CurveOps, pt, size: int):
    """Inclusive running group sum along the last axis (any leading batch).

    Roll-based Hillis-Steele: log2(size) sequential steps, ONE adder
    instantiation in the graph (shift is a traced value through jnp.roll).
    """
    steps = max((size - 1).bit_length(), 1) if size > 1 else 0
    lane = jnp.arange(size)

    def body(i, x):
        sh = jnp.int32(1) << i
        rolled = _pt_map(x, lambda a: jnp.roll(a, sh, axis=-1))
        summed = _add(curve, x, rolled)
        return curve.select(lane < sh, x, summed)

    return jax.lax.fori_loop(0, steps, body, pt) if steps else pt


def _prefix_2level(curve: CurveOps, pt, size: int):
    """Inclusive running group sum along the last axis, work-efficient.

    Two-level decomposition: Hillis passes do size*log2(size) adds; at
    bucket-extraction sizes (2^11+ lanes for c=12+) that log factor is
    the dominant bucket-phase cost and caps the useful window size.
    Splitting into (size/bi, bi) blocks — inner prefix, outer prefix of
    block totals, one broadcast add — cuts the work to about
    size*(log2(bi) + 1) for 3 adder instantiations instead of 1."""
    if size <= 64 or (size & (size - 1)):
        return _hillis_prefix(curve, pt, size)
    bi = 1 << ((size.bit_length() + 1) // 2)
    bo = size // bi
    split = _pt_map(pt, lambda a: a.reshape(a.shape[:-1] + (bo, bi)))
    inner = _hillis_prefix(curve, split, bi)
    tots = _pt_map(inner, lambda a: a[..., -1])
    outer = _hillis_prefix(curve, tots, bo)
    rolled = _pt_map(outer, lambda a: jnp.roll(a, 1, axis=-1))
    bshape = _shape_of(tots[0])
    excl = curve.select(jnp.arange(bo) == 0, curve.inf(bshape), rolled)
    summed = _add(curve, inner, _pt_map(
        excl, lambda a: jnp.broadcast_to(a[..., None],
                                         a.shape + (bi,))))
    return _pt_map(summed,
                   lambda a: a.reshape(a.shape[:-2] + (size,)))


def _chunked_prefix(curve: CurveOps, pt, sign, batch: Tuple[int, ...],
                    n: int):
    """All-positions inclusive prefix group sums along the last axis.

    pt: PACKED affine point pytree, leaves (8, *batch, n) with
    n % _CHUNK == 0 ((0,0) = infinity); sign: (1, *batch, n) u32, 1 =>
    the point enters negated (signed Pippenger digits) — columns go
    through the cheaper mixed adder (z2 = 1), unpacked and sign-applied
    in VMEM. Returns Jacobian (within, excl): within-chunk inclusive
    prefixes (16, *batch, n viewed as nb*C) and exclusive per-chunk
    offsets (16, *batch, nb), so PS(k) = excl[k // C] + within[k] for
    inclusive-k and callers gather only the boundary positions they
    need.
    """
    C = _CHUNK
    nb = n // C
    from .curve import Fq2Ops
    K = _scan_cols(isinstance(curve.f, Fq2Ops))
    # (8,*batch,n) -> (C, 8, *batch, nb): C becomes the scan axis; K
    # consecutive columns are fed to ONE kernel per scan step (the
    # accumulator never leaves VMEM between them). Each scan column is
    # (*coords, sign_row).
    def to_cols(a):
        a = a.reshape(a.shape[:-1] + (nb, C))
        return jnp.moveaxis(a, -1, 0)
    cols = _pt_map(pt, to_cols) + (to_cols(sign),)
    xs = tuple(_pt_map(cols, lambda a: a[j::K]) for j in range(K))

    def step(acc, colk):
        from . import fused
        outs = fused.scan_cols_packed(curve, acc, colk)
        return outs[-1], outs

    tot, within_k = jax.lax.scan(step, curve.inf(batch + (nb,)), xs)
    # within_k: K-tuple of points, leaves (C/K, 16, *batch, nb) at
    # column index s*K + j. Kept in COLUMN layout: reassembling the
    # flat (…, n) lane axis was a moveaxis relayout — 2 co-live copies
    # of the biggest array in the MSM (~805 MB per G1 slice-group at
    # segment 2^19) for the sake of ~M boundary gathers; _ps_at
    # gathers the boundaries straight out of the column layout instead
    # (part of the round-5 2^24 HBM fit).
    incl = _prefix_2level(curve, tot, nb)
    rolled = _pt_map(incl, lambda a: jnp.roll(a, 1, axis=-1))
    excl = curve.select(jnp.arange(nb) == 0, curve.inf(batch + (nb,)), rolled)
    return within_k, excl


def _ps_at(curve: CurveOps, within_k, excl, k):
    """PS(k) = sum of the first k sorted points; k: (*batch, m) int32.

    within_k: the scan's COLUMN-layout prefix outputs (K-tuple of
    points, leaves (C/K, 16, *batch, nb)): flat position
    j = nb_idx*C + c_idx lives at scan step c_idx // K, kernel column
    c_idx % K, lane nb_idx."""
    K = len(within_k)
    pos = jnp.maximum(k - 1, 0)
    cidx = pos % _CHUNK
    nbidx = pos // _CHUNK
    step = cidx // K

    def g(a):
        # a: (C/K, 16, *batch, nb) -> (16, *batch, m) at
        # [step, :, batch…, nbidx]
        nbatch = a.ndim - 3
        ib = [jax.lax.broadcasted_iota(jnp.int32, pos.shape, d)
              for d in range(nbatch)]
        out = a[(step, slice(None), *ib, nbidx)]  # (*batch, m, 16)
        return jnp.moveaxis(out, -1, 0)

    w = _pt_map(within_k[0], g)
    if K > 1:
        jk = cidx % K
        for j in range(1, K):
            wj = _pt_map(within_k[j], g)
            mask = (jk == j)[None]
            w = jax.tree.map(lambda a, b: jnp.where(mask, b, a), w, wj)
    e = _pt_take_last(excl, nbidx)
    s = _add(curve, w, e)
    return curve.select(k == 0, curve.inf(k.shape), s)


# ---------------------------------------------------------------------------
# digit extraction
# ---------------------------------------------------------------------------

def window_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """(*batch, n, 8) PACKED u32 words (256-bit little-endian scalars)
    -> (W, *batch, n) c-bit window digits, c <= 16."""
    assert 1 <= c <= 16
    nwin = -(-SCALAR_BITS // c)
    pad = jnp.zeros(scalars.shape[:-1] + (1,), dtype=jnp.uint32)
    s = jnp.concatenate([scalars, pad], axis=-1)
    mask = jnp.uint32((1 << c) - 1)
    rows = []
    for w in range(nwin):
        off_bits = w * c
        word, off = divmod(off_bits, 32)
        v = s[..., word] >> off
        if off:  # window may straddle into the next word (off + c < 64)
            v = v | (s[..., word + 1] << (32 - off))
        rows.append(v & mask)
    return jnp.stack(rows).astype(jnp.int32)


def _raw_digit(scalars: jnp.ndarray, w: int, c: int,
               lead: bool = False) -> jnp.ndarray:
    """Window w's unsigned c-bit digit from PACKED scalars — trailing
    word axis (*b, n, W) by default, or LEADING (W, *b, n) with
    lead=True (the GLV layout: minor-n tiles clean on TPU). Bits past
    32*W are zero."""
    nw = scalars.shape[0] if lead else scalars.shape[-1]
    bsh = scalars.shape[1:] if lead else scalars.shape[:-1]
    at = (lambda i: scalars[i]) if lead else (lambda i: scalars[..., i])
    mask = jnp.uint32((1 << c) - 1)
    off_bits = w * c
    word, off = divmod(off_bits, 32)
    v = (at(word) >> off) if word < nw else jnp.zeros(bsh, jnp.uint32)
    if off and word + 1 < nw:
        v = v | (at(word + 1) << (32 - off))
    return (v & mask).astype(jnp.int32)


def signed_digit_carries(scalars: jnp.ndarray, c: int,
                         bits: int = SCALAR_BITS,
                         lead: bool = False) -> jnp.ndarray:
    """Per-window carry bits of the signed recode, packed as one u32
    bitmask per scalar (bit w = carry INTO window w).

    Memory lever for 2^24-scale MSMs: materializing all W encoded digit
    rows is W*4 bytes/point (5+ GB); with this mask the scan recomputes
    each window group's digits on the fly (cheap bit extraction) from
    the scalars it already holds."""
    nwin = -(-bits // c)
    assert nwin <= 64
    half = 1 << (c - 1)
    bsh = scalars.shape[1:] if lead else scalars.shape[:-1]
    out = [jnp.zeros(bsh, jnp.uint32) for _ in range(2)]
    carry = jnp.zeros(bsh, jnp.int32)
    for w in range(nwin):
        d = _raw_digit(scalars, w, c, lead) + carry
        neg = d >= half
        carry = neg.astype(jnp.int32)
        if w + 1 < nwin:
            word, bit = divmod(w + 1, 32)
            out[word] = out[word] | (carry.astype(jnp.uint32) << bit)
    return jnp.stack(out)  # (2, *b, n)


def group_signed_digits(scalars9, carry_bits, w0, G: int, c: int,
                        lead: bool = False):
    """ENCODED signed digits (|d|*2 + neg) for windows w0..w0+G-1;
    w0 may be TRACED (the window-group scan index — digits are computed
    inside the scan instead of materialized for all W windows at once).
    scalars9: (*b, n, 9) packed scalars — or (W+1, *b, n) with
    lead=True — with one zero pad word so the straddling 2-word dynamic
    slice never clamps; carry_bits: (2, *b, n) u32 (64 window-carry
    bits). Returns (G, *b, n) int32."""
    half, full = 1 << (c - 1), 1 << c
    w0 = jnp.asarray(w0, jnp.int32)
    rows = []
    for j in range(G):
        w = w0 + j
        off_bits = w * c
        word = off_bits // 32
        off = (off_bits - word * 32).astype(jnp.uint32)
        if lead:
            sl = jax.lax.dynamic_slice_in_dim(scalars9, word, 2, axis=0)
            lo, hi = sl[0], sl[1]
        else:
            sl = jax.lax.dynamic_slice_in_dim(scalars9, word, 2, axis=-1)
            lo, hi = sl[..., 0], sl[..., 1]
        v = (lo >> off) | jnp.where(off > 0, hi << (32 - off), 0)
        d = (v & jnp.uint32(full - 1)).astype(jnp.int32)
        cw = jnp.where(w < 32, carry_bits[0] >> w,
                       carry_bits[1] >> jnp.maximum(w - 32, 0))
        d = d + (cw & 1).astype(jnp.int32)
        neg = d >= half
        dd = jnp.where(neg, d - full, d)
        rows.append(jnp.abs(dd) * 2 + (dd < 0))
    return jnp.stack(rows)


def signed_window_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """Signed-digit recoding, ENCODED as |d|*2 + (d<0).

    Windows recode to d' in [-2^(c-1), 2^(c-1)] (carrying 1 into the
    next window when d >= 2^(c-1)), which HALVES the bucket range: the
    point for a negative digit enters the scan with y negated (one cheap
    field negation) instead of doubling the bucket count. Requires
    scalars < 2^254 (always true here: MSM inputs are Fr elements < r,
    SURVEY.md §3.1), so the top window never carries out.

    The encoding packs magnitude and sign into one sort key: bucket
    boundaries of |d| are searchsorted at 2j+1, and the scan reads the
    sign from bit 0.
    """
    raw = window_digits(scalars, c)          # (W, *batch, n) in [0, 2^c)
    half, full = 1 << (c - 1), 1 << c
    rows = []
    carry = jnp.zeros_like(raw[0])
    for w in range(raw.shape[0]):
        d = raw[w] + carry
        neg = d >= half
        dd = jnp.where(neg, d - full, d)     # [-2^(c-1), 2^(c-1)]
        carry = neg.astype(jnp.int32)
        rows.append(jnp.abs(dd) * 2 + (dd < 0))
    return jnp.stack(rows)


def n_windows(c: int, bits: int = SCALAR_BITS) -> int:
    """Window passes an MSM pays at window size c over `bits`-bit
    scalars (bench roofline accounting + combine sizing)."""
    return -(-bits // c)


def best_window_bits(n: int, segment: int = 0) -> int:
    """Pick c minimizing the cost model of this formulation (PERF.md):
    per window, sort+gather+scan ~ n point-equivalents and the
    TELESCOPED extraction ~ 15 * 2^(c-1) point-equivalents per segment.
    The 15 is fitted on v5e (round-3 phase bench: extraction
    13.2 ms/window at M=4096 vs 0.22 us/point n-term) — extraction ops
    are narrower than the scan, so a bucket costs ~15x a point even
    though it does ~2 adds of work.

    Measured v5e optima agree with the model and override it where
    we swept directly: c=13 beat c=14/15/16 at 2^18 AND 2^20 even with
    telescoped extraction (round-3 sweep: 613k/576k/562k/530k pts/s at
    2^18; 1042k/1019k/918k at 2^20). Under GLV (ops/glv.py, the
    default) the scan term doubles (2n entries) and windows cover 128
    bits — the model optimum stays c=13 at 2^17+."""
    from . import glv as GLV
    glv = GLV.enabled()
    if not segment and n >= (1 << 17):
        return 13
    bits = GLV.GLV_BITS if glv else SCALAR_BITS
    neff = 2 * n if glv else n
    nseg = max(neff // segment, 1) if segment else 1
    best, best_cost = 1, None
    for c in range(1, 17):
        nwin = -(-bits // c)
        bucket = 15 * nseg * (1 << (c - 1))
        cost = nwin * (neff + bucket)
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return best


# ---------------------------------------------------------------------------
# MSM core
# ---------------------------------------------------------------------------

def _tree_total(curve: CurveOps, pt, size: int):
    """Group sum along the last axis: pairwise halving tree.

    log2(size) WIDE adds (the first over size/2 lanes) instead of a
    deep narrow scan — on v5e the sequential-step latency of narrow
    adds dominated extraction (PERF.md round-3), so the tree trades a
    few extra adder instantiations (one per halving, shapes differ)
    for ~2x fewer, much wider steps. Sizes <= 64 (the CPU test range)
    keep the single-instantiation Hillis form: XLA:CPU pays ~seconds
    per extra adder instantiation."""
    if size <= 64 or (size & (size - 1)):
        res = _hillis_prefix(curve, pt, size)
        return _pt_map(res, lambda a: a[..., -1])
    while size > 64:
        half = size // 2
        lo = _pt_map(pt, lambda a: a[..., :half])
        hi = _pt_map(pt, lambda a: a[..., half:])
        pt = _add(curve, lo, hi)
        size = half
    res = _hillis_prefix(curve, pt, size)
    return _pt_map(res, lambda a: a[..., -1])


def _window_group(curve: CurveOps, pts, digits, n: int, c: int):
    """Window totals sum_j j*B_j for a group of windows, TELESCOPED.

    digits: (G, *batch, n) ENCODED signed digits (signed_window_digits),
    pts: PACKED affine pytree, leaves (8, *batch, n). Returns a Jacobian
    point with batch (G, *batch).

    With A_j = PS(cum_j) (the prefix group sum at the bucket-j boundary,
    so B_j = A_j - A_{j-1}), the weighted total telescopes:

        sum_{j=1}^{M} j*B_j  =  M*A_M - sum_{j=0}^{M-1} A_j,   M = 2^(c-1)

    so the window needs ONE boundary gather-add per bucket (M+1 lanes),
    one ~M-add tree sum, and c-1 doublings of a single lane — about
    2*M adds, instead of materializing all M bucket sums and running two
    M-lane Hillis-Steele passes (~6*M+ adds plus a second 2(M+1)-lane
    boundary gather). The cheaper extraction moves the optimal window
    size up at 2^20+ (best_window_bits)."""
    bshape = digits.shape[:-1]       # (G, *batch)
    M = 1 << (c - 1)                 # |d| in [0, M]
    # ONE sort pass yields both the sorted digits and the permutation
    # (4x cheaper than argsort + take_along_axis re-gather of digits);
    # sorting the encoding |d|*2+neg orders by magnitude with the sign
    # riding bit 0
    iota = jax.lax.broadcasted_iota(jnp.int32, digits.shape,
                                    digits.ndim - 1)
    sorted_digits, perm = jax.lax.sort_key_val(digits, iota, dimension=-1)
    # gather: packed leaf (8, *batch, n) -> (8, G, *batch, n)
    spts = _pt_map(pts, lambda a: _gather_last(a, perm, a.ndim - 2))
    sign = (sorted_digits & 1).astype(jnp.uint32)[None]  # (1, G,*batch, n)

    within, excl = _chunked_prefix(curve, spts, sign, bshape, n)

    # bucket boundary of |d| <= j in the encoded order: key 2j+1
    queries = 2 * jnp.arange(M + 1, dtype=jnp.int32) + 1
    cum = jax.vmap(
        lambda d: jnp.searchsorted(d, queries, side="right"))(
            sorted_digits.reshape(-1, n)).reshape(bshape + (M + 1,))
    cum = cum.astype(jnp.int32)
    A = _ps_at(curve, within, excl, cum)            # (…, M+1)
    # M*A_M - sum_{j<M} A_j == sum_{j<M} (A_M - A_j): ONE wide add
    # feeding the halving tree, instead of a c-1-step doubling chain on
    # (G, *batch) lanes (narrow sequential adds are latency-bound on
    # v5e, PERF.md round-3)
    top = _pt_map(A, lambda a: jnp.broadcast_to(
        a[..., M:], a.shape[:-1] + (M,)))
    head = _pt_map(A, lambda a: a[..., :M])
    from .curve import relaxed_for
    neg = curve.neg_rx if relaxed_for(curve) else curve.neg
    diff = _add(curve, top, neg(head))
    return _tree_total(curve, diff, M)


def _combine_windows(curve: CurveOps, wpts, nwin: int, c: int):
    """Double-and-add ladder over stacked window results (batch (W,)).

    ONE adder instantiation: even phases compute acc+acc (the complete
    adder's tangent path doubles), odd phases add the window point on
    c-bit boundaries and the identity elsewhere.
    """
    total_bits = nwin * c
    bshape = _shape_of(wpts[0])[1:]  # leaves (16, W, *batch)
    identity = curve.inf(bshape)

    def body(i, acc):
        step, phase = i // 2, i % 2
        bit = total_bits - 1 - step
        widx = bit // c
        wp = _pt_map(wpts,
                     lambda a: jax.lax.dynamic_index_in_dim(
                         a, widx, axis=1, keepdims=False))
        boundary = jnp.logical_and(phase == 1, (bit % c) == 0)
        other = curve.select(phase == 0, acc,
                             curve.select(boundary, wp, identity))
        return _add(curve, acc, other)

    return jax.lax.fori_loop(0, 2 * total_bits, body, identity)


def _phi_apply_x(curve: CurveOps, x, flag=None):
    """Multiply a PACKED x-coordinate (leaf or Fq2 pair of leaves) by
    the GLV beta constant (ops/glv.py) — the endomorphism
    phi(x, y) = (beta*x, y) on table points. `flag`: optional traced
    bool — identity when False (segmented path, uniform per slice)."""
    from . import glv
    from .field import FQ
    beta = glv.params_for(curve).beta_mont
    leaves = (x,) if not isinstance(x, tuple) else x
    outs = []
    for a in leaves:
        u = unpack_limb_rows(a)
        c = FQ.const(beta, u.shape[1:])
        if flag is not None:
            # select the MULTIPLIER (beta vs Montgomery one — an exact
            # identity on canonical coords) instead of the result: a
            # where(flag, beta*x, x) kept the RAW table slice live into
            # the gather, wanting it in a second tile layout — XLA then
            # hoisted a full-table relayout copy out of the slice loop
            # (1 GiB of program temp at 2^24)
            c = FQ.select(flag, c, FQ.one_mont(u.shape[1:]))
        outs.append(pack_limb_rows(FQ.mul(u, c)))
    return outs[0] if not isinstance(x, tuple) else tuple(outs)


def _phi_extend(curve: CurveOps, pts):
    """(x, y) table of n points -> 2n-entry virtual GLV table
    [P_0..P_{n-1}, phi(P_0)..phi(P_{n-1})]: x doubles with the beta
    image appended, y repeats. (0,0) infinity padding is fixed by phi.
    Built PER WINDOW GROUP inside the msm scan (n cheap const muls
    amortized over G windows) so the extension never lives in HBM
    across the MSM."""
    x, y = pts
    xphi = _phi_apply_x(curve, x)
    cat = lambda a, b: jnp.concatenate([a, b], axis=-1)
    x2 = (cat(x, xphi) if not isinstance(x, tuple)
          else tuple(cat(a, b) for a, b in zip(x, xphi)))
    y2 = _map_leaves(y, lambda a: jnp.concatenate([a, a], axis=-1))
    return (x2, y2)


def msm(curve: CurveOps, pts, scalars: jnp.ndarray, c: int,
        window_group: int = 5, combine: bool = True, segment: int = 0,
        glv: bool | None = None, row_slice=None):
    """Multi-scalar multiplication, batched over leading axes.

    pts: PACKED affine point pytree, leaves (8, *batch, n) — two 16-bit
    limbs per u32 word (pack_limb_rows), already padded so that
    n % _CHUNK == 0, with (0,0) infinity padding. scalars:
    (*batch, n, 8) PACKED u32 plain-integer words (zero-padded rows for
    padding points). Returns a Jacobian point with batch shape (*batch,),
    or — with combine=False — the per-window totals (leaves
    (16, W, *batch)) for the ~256-doubling Horner combine to run on the
    HOST: W*B points are a few KB, and host-side exact EC math beats
    ~2*256 sequential single-lane device steps by orders of magnitude
    (see prover.combine_windows_host).

    Independent MSMs of equal length should ride the batch axes: the
    prover fuses its four G1 MSMs (groth16.cpp:173-204) into one call,
    which widens every sequential scan step 4x.

    `segment` (a multiple of _CHUNK dividing n, 0 = off) processes the
    point axis in n/segment slices, accumulating BUCKET sums across
    slices before the one weighted suffix pass per window group — this
    bounds the prefix-scan working set (the all-positions `within`
    array is ~192*G*B bytes per point) so 2^24-scale MSMs fit in HBM.

    `row_slice=(row_lo, nrows)` (row_lo may be TRACED) selects nrows
    leading-axis rows of a bigger scalar stack WITHOUT materializing
    the slice: on the segmented-GLV path every per-slice read slices
    (row, point) in one dynamic_slice, so the program never holds the
    (nrows, n, 8) row copy (1 GB at 2^24 — part of the round-5 HBM
    fit). Paths that need the whole rows up front fall back to one
    materialized slice.

    `glv` (default: ops/glv.enabled()) decomposes every scalar into two
    ~127-bit halves against the curve's cube-root endomorphism
    (ops/glv.py): the window count HALVES (ceil(128/c) vs ceil(256/c))
    over a 2n-entry virtual table [P, phi(P)] — same total scan adds,
    half the bucket-extraction passes (the dominant fixed cost per
    window). Entry signs fold into the signed digit encoding by XOR.
    """
    from . import glv as GLV
    if glv is None:
        glv = GLV.enabled()
    npts = scalars.shape[-2]
    if row_slice is not None:
        row_lo, nrows = row_slice
        bshape = (nrows,)
    else:
        bshape = scalars.shape[:-2]
    if glv:
        bits = GLV.GLV_BITS
        n = 2 * npts
        # segmented GLV decomposes PER SLICE inside the scan body: the
        # full decomposed stack + carry masks are ~2 GB of HBM at 2^24
        # and the chunked decompose's reassembly concat transiently
        # doubles that — per-slice recompute is ~ms against a slice's
        # scan (the 2^24 OOM fix; costs one extra decompose per window
        # group over the same scalars)
        # per-slice decompose assumes no slice straddles the k1/k2
        # boundary of the virtual [k1 | k2] axis: segment must divide
        # npts itself (not just n = 2*npts). Odd sizes fall back to the
        # pre-decomposed path, which only needs segment | n.
        seg_glv = bool(segment and segment < n and npts % segment == 0)
        if row_slice is not None and not seg_glv:
            # only the per-slice path reads rows lazily; materialize
            scalars = jax.lax.dynamic_slice_in_dim(
                scalars, row_lo, nrows, axis=0)
            row_slice = None
        if not seg_glv:
            # scalars become (5, *b, 2n) — word axis LEADING, zero pad
            # word row included (glv.decompose)
            scalars, neg = GLV.decompose(GLV.params_for(curve), scalars)
    else:
        neg, bits = None, SCALAR_BITS
        seg_glv = False
        n = scalars.shape[-2]
        if row_slice is not None:
            scalars = jax.lax.dynamic_slice_in_dim(
                scalars, row_lo, nrows, axis=0)
            row_slice = None
    nwin = -(-bits // c)
    G_ = min(window_group, nwin)
    while nwin % G_:
        G_ -= 1
    # G2 runs the scan on the cheap-b3 iso-twist (ops/curve.py G2P_ISO;
    # prepare_g2 / the prover rescale the tables once); window totals
    # are rescaled BACK below, so combines and callers stay on the
    # original curve. phi commutes with the iso rescale (both are
    # diagonal coordinate scalings), so GLV composes transparently.
    iso = getattr(curve, "iso_scan", None)
    sc = iso or curve
    # digits are (re)computed per window group inside the scan — one u32
    # carry bitmask per scalar instead of W int32 digit rows (a 2^24-
    # scale MSM cannot hold the full digit tensor next to the tables)
    if seg_glv:
        carries = s9 = None     # derived per slice (seg_step below)
    elif glv:
        carries = signed_digit_carries(scalars, c, bits, lead=True)
        s9 = scalars  # decompose already appends the zero pad word row
    else:
        carries = signed_digit_carries(scalars, c, bits)
        s9 = jnp.concatenate(
            [scalars, jnp.zeros(bshape + (n, 1), jnp.uint32)], axis=-1)

    if segment and segment < n:
        assert n % segment == 0 and segment % _CHUNK == 0
        S = n // segment

        def step(_, ig):
            acc0 = sc.inf((G_,) + bshape)

            def seg_step(acc, i):
                off = i * segment
                flag = off >= npts
                offp = jnp.where(flag, off - npts, off)
                pseg = _pt_map(pts, lambda a: jax.lax.dynamic_slice_in_dim(
                    a, offp, segment, axis=a.ndim - 1))
                pseg = jax.lax.optimization_barrier(pseg)
                if glv:  # phi image for slices in the upper half
                    pseg = (_phi_apply_x(sc, pseg[0], flag), pseg[1])
                # digits computed PER SLICE from sliced scalars — a
                # full-axis digit tensor is G*4 bytes/entry (1.3 GB per
                # group at 2^24-GLV scale), a slice's is ~KBs
                if seg_glv:
                    # decompose THIS slice's scalars only: entry off of
                    # the virtual [k1 | k2] axis maps to point off%npts
                    # with the k1/k2 block chosen by `flag`
                    if row_slice is not None:
                        # (row, point) sliced TOGETHER: the (nrows, n,
                        # 8) row copy never materializes
                        scseg = jax.lax.dynamic_slice(
                            scalars, (row_lo, offp, 0),
                            (nrows, segment, scalars.shape[-1]))
                    else:
                        scseg = jax.lax.dynamic_slice_in_dim(
                            scalars, offp, segment, axis=-2)
                    d2, n2 = GLV.decompose(GLV.params_for(curve), scseg)
                    start = jnp.where(flag, segment, 0)
                    s9seg = jax.lax.dynamic_slice_in_dim(
                        d2, start, segment, axis=-1)
                    nseg = jax.lax.dynamic_slice_in_dim(
                        n2, start, segment, axis=-1)
                    cseg = signed_digit_carries(s9seg, c, bits,
                                                lead=True)
                else:
                    s9seg = jax.lax.dynamic_slice_in_dim(
                        s9, off, segment,
                        axis=s9.ndim - 1 if glv else s9.ndim - 2)
                    cseg = jax.lax.dynamic_slice_in_dim(
                        carries, off, segment, axis=carries.ndim - 1)
                    nseg = (jax.lax.dynamic_slice_in_dim(
                        neg, off, segment, axis=neg.ndim - 1)
                        if neg is not None else None)
                dseg = group_signed_digits(s9seg, cseg, ig * G_, G_, c,
                                           lead=glv)
                if nseg is not None:
                    dseg = dseg ^ nseg[None].astype(dseg.dtype)
                # window totals are linear in the bucket sums, so each
                # slice contributes ONE point per window (telescoped
                # extraction per slice) — no (G, *batch, 2^(c-1)+1)
                # bucket accumulator across slices
                t = _window_group(sc, pseg, dseg, segment, c)
                return _add(sc, acc, t), None

            acc, _ = jax.lax.scan(seg_step, acc0,
                                  jnp.arange(S, dtype=jnp.int32))
            return None, acc
    else:
        def step(_, ig):
            dg = group_signed_digits(s9, carries, ig * G_, G_, c, lead=glv)
            if neg is not None:
                dg = dg ^ neg[None].astype(dg.dtype)
            p2 = _phi_extend(sc, pts) if glv else pts
            return None, _window_group(sc, p2, dg, n, c)

    _, wg = jax.lax.scan(step, None,
                         jnp.arange(nwin // G_, dtype=jnp.int32))
    wpts = _pt_map(
        wg, lambda a: jnp.moveaxis(a, 0, 1).reshape((16, nwin) + bshape))
    if iso is not None:
        x, y, z = wpts
        sh = _shape_of(x)
        w2i = curve.f.const(iso.iso["w2i"], sh)
        w3i = curve.f.const(iso.iso["w3i"], sh)
        x, y = curve.f.mul_many([(x, w2i), (y, w3i)])
        wpts = (x, y, z)
    if not combine:
        return wpts
    return _combine_windows(curve, wpts, nwin, c)


# ---------------------------------------------------------------------------
# zkey-layout wrappers
# ---------------------------------------------------------------------------

def pad_len(n: int) -> int:
    return max(_CHUNK, -(-n // _CHUNK) * _CHUNK)


def prepare_g1(points_nk16) -> Tuple:
    """(n, 2, 16) Montgomery affine limbs -> padded PACKED affine pytree
    (x, y), leaves (8, npad), (0,0) = infinity — the zkey layout is used
    in place (SURVEY.md §1 zero-deserialization), limb-transposed and
    16-bit-pair packed (half the gather bytes on the MSM hot path)."""
    import numpy as np
    pts = np.asarray(points_nk16)
    n, npad = pts.shape[0], pad_len(pts.shape[0])
    if npad != n:
        pts = np.concatenate(
            [pts, np.zeros((npad - n, 2, 16), np.uint32)], axis=0)
    x = jnp.asarray(pack_limb_rows(np.moveaxis(pts[:, 0], -1, 0)))
    y = jnp.asarray(pack_limb_rows(np.moveaxis(pts[:, 1], -1, 0)))
    return (x, y)


def _g2_rescale_chunk(c4):
    """(4, 16, CH) unpacked coords -> (4, 8, CH) packed, rescaled onto
    the iso-twist (x*w2, y*w3): see ops/curve.py G2P_ISO."""
    from .curve import FQ2, G2P_ISO
    x = (c4[0], c4[1])
    y = (c4[2], c4[3])
    sh = c4.shape[2:]
    w2 = FQ2.const(G2P_ISO.iso["w2"], sh)
    w3 = FQ2.const(G2P_ISO.iso["w3"], sh)
    xr, yr = FQ2.mul_many([(x, w2), (y, w3)])
    return jnp.stack([pack_limb_rows(xr[0]), pack_limb_rows(xr[1]),
                      pack_limb_rows(yr[0]), pack_limb_rows(yr[1])])


@jax.jit
def g2_rescale_packed(pts):
    """Rescale a PACKED G2 table pytree ((x0,x1),(y0,y1)), leaves
    (8, *batch, n), onto the iso-twist G2P_ISO — a one-time pass at
    table build (chunked so 2^24-scale tables never materialize
    unpacked). (0,0) infinity is fixed by the map."""
    import numpy as np
    leaves = [pts[0][0], pts[0][1], pts[1][0], pts[1][1]]
    orig = leaves[0].shape
    n = int(np.prod(orig[1:]))
    CH = min(1 << 15, n)
    npad = -(-n // CH) * CH
    flat = []
    for a in leaves:
        a = a.reshape(8, n)
        if npad != n:
            a = jnp.concatenate(
                [a, jnp.zeros((8, npad - n), jnp.uint32)], axis=1)
        flat.append(unpack_limb_rows(a))
    cols = jnp.stack(flat).reshape(4, 16, npad // CH, CH)
    out = jax.lax.map(_g2_rescale_chunk,
                      jnp.moveaxis(cols, 2, 0))   # (nch, 4, 8, CH)
    out = jnp.moveaxis(out, 0, 2).reshape(4, 8, npad)[:, :, :n]
    rs = [out[k].reshape(orig) for k in range(4)]
    return ((rs[0], rs[1]), (rs[2], rs[3]))


def prepare_g2(points_nk16) -> Tuple:
    """(n, 4, 16) limbs (x.c0 x.c1 y.c0 y.c1) -> padded PACKED pytree,
    rescaled onto the iso-twist (the msm() scan contract for G2P)."""
    import numpy as np
    pts = np.asarray(points_nk16)
    n, npad = pts.shape[0], pad_len(pts.shape[0])
    if npad != n:
        pts = np.concatenate(
            [pts, np.zeros((npad - n, 4, 16), np.uint32)], axis=0)
    coords = [jnp.asarray(pack_limb_rows(np.moveaxis(pts[:, k], -1, 0)))
              for k in range(4)]
    return g2_rescale_packed(((coords[0], coords[1]),
                              (coords[2], coords[3])))


def pad_scalars(scalars_n16, npad: int) -> jnp.ndarray:
    """(n, 16) u32 16-bit limbs -> (npad, 8) PACKED device scalars (the
    msm()/window_digits wire format: half the host->device bytes)."""
    import numpy as np
    s = np.asarray(scalars_n16, dtype=np.uint32)
    s = s[:, 0::2] | (s[:, 1::2] << 16)
    if s.shape[0] != npad:
        s = np.concatenate(
            [s, np.zeros((npad - s.shape[0], 8), np.uint32)], axis=0)
    return jnp.asarray(s)


@functools.partial(jax.jit, static_argnums=(2, 3))
def msm_g1(pts, scalars, c: int, window_group: int = 5):
    return msm(G1P, pts, scalars, c, window_group)


@functools.partial(jax.jit, static_argnums=(2, 3))
def msm_g2(pts, scalars, c: int, window_group: int = 5):
    return msm(G2P, pts, scalars, c, window_group)
