"""Pallas-fused curve arithmetic: the complete Jacobian adder as ONE
TPU kernel.

Why: the XLA path materializes every intermediate of the ~23-mul adder
formula to HBM (measured: mont_mul throughput saturates an order of
magnitude below the VPU because each CIOS step round-trips memory). A
Pallas kernel reads the six input coordinates once, runs the whole
formula in VMEM/registers (muls fully unrolled — no scan state spills),
and writes three coordinates — the arithmetic-intensity fix that makes
the adder compute-bound.

The kernel body REUSES ops/field.py and ops/curve.py verbatim (they are
written to be Pallas-compatible: elementwise ops + static slices on a
(16, lanes) layout, limb axis on sublanes, batch on lanes).

Enable/disable with RSTPU_PALLAS=1/0 (default: on for TPU backends, off
on CPU where interpret mode would be slower than plain XLA).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

BLOCK = 128  # lanes per kernel instance: ONE vreg lane tile. Round-2
# sweep on v5e: 128-lane blocks beat the round-1 1024/512-lane schedule
# by 25-35% on every adder-bound phase (small blocks keep live
# temporaries tiny, so Mosaic overlaps grid steps); RSTPU_FUSED_BLOCK /
# RSTPU_SCAN_BLOCK override for re-tuning on other TPU generations


@functools.cache
def enabled() -> bool:
    env = os.environ.get("RSTPU_PALLAS")
    if env is not None:
        return env != "0"
    return jax.default_backend() not in ("cpu",)


def _kernel_ctx():
    """Field-arithmetic mode for a Pallas kernel body: real Mosaic
    compilation needs fully unrolled muls/adders (no scan state in
    VMEM); interpret mode (CPU tests) keeps the scan forms, which
    compile ~30x faster on XLA:CPU (see ops/field._scan_carries)."""
    import contextlib
    from . import field as FF

    if jax.default_backend() == "cpu":
        return contextlib.nullcontext()
    return FF.force_unroll()


def _flatten_pt(pt):
    """Point pytree -> (leaves, treedef-like rebuild fn)."""
    leaves = []

    def walk(e):
        if isinstance(e, tuple):
            return tuple(walk(c) for c in e)
        leaves.append(e)
        return len(leaves) - 1

    idx_tree = tuple(walk(c) for c in pt)

    def rebuild(vals):
        def go(t):
            if isinstance(t, tuple):
                return tuple(go(c) for c in t)
            return vals[t]
        return tuple(go(c) for c in idx_tree)

    return leaves, rebuild


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _binary(fn, fallback, p, q, n_out_leaves: int, out_tree: bool = False,
            blk_max: int = 0):
    """Fuse a binary point op into one Pallas kernel over lane blocks.

    p, q: point pytrees with (16, *batch) u32 leaves (batch shapes
    equal; PACKED leaves carry 8 rows instead). The kernel reads the
    input leaves once, evaluates `fn` fully in VMEM (field muls
    unrolled), and writes the output leaves — removing the HBM
    round-trips between the formula's ~20 field ops.

    out_tree=False: the output has p's structure. out_tree=True: the
    output is a TUPLE of n_out_leaves/len(p_leaves) copies of p's
    structure (the multi-column scan kernel returns every intermediate
    accumulator).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_leaves, rebuild_p = _flatten_pt(p)
    q_leaves, rebuild_q = _flatten_pt(q)
    bshape = p_leaves[0].shape[1:]
    n = int(np.prod(bshape)) if bshape else 1
    if not enabled() or n < 256:
        return fallback(p, q)

    np_, nq = len(p_leaves), len(q_leaves)
    env_blk = os.environ.get("RSTPU_FUSED_BLOCK")
    if not blk_max and env_blk:
        blk_max = int(env_blk)
    blk = min(blk_max or BLOCK, _round_up(n, 128))
    npad = _round_up(n, blk)

    def prep(a):
        a = a.reshape(a.shape[0], n)
        if npad != n:
            a = jnp.concatenate(
                [a, jnp.zeros((a.shape[0], npad - n), jnp.uint32)], axis=1)
        return a

    flat = [prep(a) for a in p_leaves + q_leaves]

    def kernel(*refs):
        ins = refs[:np_ + nq]
        outs = refs[np_ + nq:]
        vals = [r[:] for r in ins]
        pp = rebuild_p(vals[:np_])
        qq = rebuild_q(vals[np_:])
        with _kernel_ctx():   # no lax.scan state inside a real kernel
            rr = fn(pp, qq)
        r_leaves, _ = _flatten_pt(rr)
        for o, v in zip(outs, r_leaves):
            o[:] = v

    # leading dim per leaf: 16 (limb rows) or 8 (packed pair rows)
    def spec_for(d):
        return pl.BlockSpec((d, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out_spec = spec_for(16)
    out = pl.pallas_call(
        kernel,
        grid=(npad // blk,),
        in_specs=[spec_for(a.shape[0]) for a in flat],
        out_specs=[out_spec] * n_out_leaves,
        out_shape=[jax.ShapeDtypeStruct((16, npad),
                                        jnp.uint32)] * n_out_leaves,
        interpret=jax.default_backend() == "cpu",  # RSTPU_PALLAS=1 on CPU
    )(*flat)
    out = [a[:, :n].reshape((16,) + bshape) for a in out]
    if out_tree:
        per = len(p_leaves)
        return tuple(rebuild_p(out[j * per:(j + 1) * per])
                     for j in range(n_out_leaves // per))
    return rebuild_p(out)


def add(curve, p, q):
    """Complete add, fused. Falls back below 256 lanes. Runs the
    relaxed [0, 2p] group law on G1 (ops/curve.relaxed_for): every
    caller is inside the MSM pipeline, whose host consumers reduce
    mod p."""
    from .curve import relaxed_for
    fn = curve.add_rx if relaxed_for(curve) else curve.add
    nl = len(_flatten_pt(p)[0])
    return _binary(fn, fn, p, q, nl)


def add_mixed(curve, p, q):
    """Jacobian + affine complete add, fused (z2 = 1 variant)."""
    nl = len(_flatten_pt(p)[0])
    return _binary(curve.add_mixed, curve.add_mixed, p, q, nl)


def scan_cols_packed(curve, acc, cols):
    """K sequential signed mixed adds in ONE kernel: acc' = acc ± c_0 ...
    returning every intermediate accumulator (the MSM prefix scan needs
    all positions). cols: tuple of K (*PACKED affine coords, sign_row)
    tuples — sign_row is (1, *batch) u32, 1 => add the negated point
    (signed Pippenger digits). Returns a tuple of K Jacobian points.

    vs K separate add_mixed calls: the accumulator stays in VMEM across
    the K adds (no HBM round-trip between steps) and the per-kernel
    launch cost is paid once."""
    from .curve import _map_leaves, relaxed_for
    from .msm import unpack_limb_rows

    k = len(cols)
    p_leaves, _ = _flatten_pt(acc)
    out_leaves = len(p_leaves) * k
    add_mixed = (curve.add_mixed_rx if relaxed_for(curve)
                 else curve.add_mixed)

    def fn(pp, qq):
        outs = []
        a = pp
        for j in range(k):
            coords, s = qq[j][:-1], qq[j][-1]
            x2, y2 = tuple(
                _map_leaves(c, unpack_limb_rows) for c in coords)
            neg = s[0] != 0
            # table points are canonical (< p): the plain negation
            # keeps the affine operand canonical for add_mixed_rx
            y2 = curve.f.select(neg, curve.f.neg(y2), y2)
            a = add_mixed(a, (x2, y2))
            outs.append(a)
        return tuple(outs)

    # measured optimum at 2^18 on v5e (PERF.md): ONE 128-lane vreg tile
    # per scan-kernel block — the small block keeps live temporaries
    # tiny so Mosaic double-buffers the grid; 512-lane blocks were ~25%
    # slower (RSTPU_SCAN_BLOCK overrides for tuning)
    blk = int(os.environ.get("RSTPU_SCAN_BLOCK", 128))
    return _binary(fn, fn, acc, cols, out_leaves, out_tree=True,
                   blk_max=blk)


def add_mixed_packed(curve, p, q_packed):
    """Jacobian + PACKED affine add: q leaves are (8, *batch) 16-bit
    pairs (ops/msm.pack_limb_rows); the kernel unpacks them in VMEM so
    the gather/scan HBM traffic for the affine columns is halved."""
    from .curve import _map_leaves
    from .msm import unpack_limb_rows

    def fn(pp, qq):
        return curve.add_mixed(pp, tuple(
            _map_leaves(c, unpack_limb_rows) for c in qq))

    return _binary(fn, fn, p, q_packed, len(_flatten_pt(p)[0]))


def ntt_butterfly(lo, hi, tw, dif: bool):
    """One radix-2 butterfly layer as a fused kernel over (lo, hi) pairs
    (partners pre-separated by a STATIC reshape — no gather):
      DIT: m = tw*hi; (lo + m, lo - m)
      DIF: (lo + hi, tw*(lo - hi))
    lo, hi, tw: (16, *batch) u32 — HALF the transform length, so each
    stage runs ONE mont_mul over n/2 lanes (the lane-uniform xor-partner
    formulation multiplied all n lanes and paid a data-dependent gather
    at ~2 GB/s, which dominated the whole NTT)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .field import FR

    def fb(lo, hi, tw):
        if dif:
            return FR.add(lo, hi), FR.mul(tw, FR.sub(lo, hi))
        m = FR.mul(tw, hi)
        return FR.add(lo, m), FR.sub(lo, m)

    shape = lo.shape
    n = int(np.prod(shape[1:]))
    if not enabled() or n < 256:
        return fb(lo, hi, tw)
    # butterfly stages are HBM-bandwidth-bound, not adder-bound: big
    # blocks keep the DMA granule large (128-lane blocks measured ~25
    # GB/s effective at 2^20; the adder-kernel optimum does NOT apply)
    blk = min(int(os.environ.get("RSTPU_NTT_BLOCK", 2048)),
              _round_up(n, 128))
    npad = _round_up(n, blk)

    def prep(a):
        a = a.reshape(16, n)
        if npad != n:
            a = jnp.concatenate(
                [a, jnp.zeros((16, npad - n), jnp.uint32)], axis=1)
        return a

    def kernel(lo_ref, hi_ref, tw_ref, o1_ref, o2_ref):
        with _kernel_ctx():
            o1, o2 = fb(lo_ref[:], hi_ref[:], tw_ref[:])
            o1_ref[:] = o1
            o2_ref[:] = o2

    spec = pl.BlockSpec((16, blk), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(npad // blk,),
        in_specs=[spec] * 3,
        out_specs=[spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((16, npad), jnp.uint32)] * 2,
        interpret=jax.default_backend() == "cpu",
    )(prep(lo), prep(hi), prep(tw))
    return (out[0][:, :n].reshape(shape), out[1][:, :n].reshape(shape))


# ---------------------------------------------------------------------------
# whole-transform pass fusion (round 4)
#
# The per-stage butterfly kernels above pay, for EVERY stage, a full
# HBM round trip PLUS the surrounding XLA copies (the (…, nblk, 2,
# half) slice/stack relayouts cannot fuse into a pallas_call's opaque
# operands) — measured ~50 GB/s effective at 2^20, 6% of HBM peak.
# ntt_fused_pass runs a GROUP of stages on a (16, BM, 8, Cp) VIEW of
# the flat poly in ONE kernel: the 8-extent second-minor axis carries
# up to 3 "row" stages (global halves 2^k * Cp, k = 0..2) as sublane
# slice/concat butterflies, and — when Cp == blk — all lane stages ride
# along (splits for half >= 128, rolls below). Between passes only
# free reshape views happen (minor dim stays >= 128-aligned, second-
# minor a multiple of 8, so the (8, 128) tiling is unchanged).
# Twiddles arrive as PRE-SLICED tables (tw[:, ::stride][:, :half]
# reshaped per kind), so the kernel does exactly one mont_mul per
# stage over half (split/axis forms) or all (roll form) elements.
# ---------------------------------------------------------------------------

def _bf(lo, hi, tw, dif: bool):
    from .field import FR
    if dif:
        return FR.add(lo, hi), FR.mul(tw, FR.sub(lo, hi))
    m = FR.mul(tw, hi)
    return FR.add(lo, m), FR.sub(lo, m)


def _axis_butterfly(v, tw, k: int, dif: bool):
    """Butterfly along the 8-extent axis of v: (16, 8, blk); partner
    distance d = 2^k sublanes. tw: (16, 2^k, blk) = w^(stride*(u*Cp+c))
    sliced for this lane block."""
    import jax.numpy as jnp
    d = 1 << k
    g = 8 // (2 * d)
    los = jnp.concatenate(
        [v[:, j * 2 * d: j * 2 * d + d] for j in range(g)], axis=1)
    his = jnp.concatenate(
        [v[:, j * 2 * d + d: (j + 1) * 2 * d] for j in range(g)], axis=1)
    twb = jnp.tile(tw, (1, g, 1)) if g > 1 else tw
    nlo, nhi = _bf(los, his, twb, dif)
    return jnp.concatenate(
        [jnp.concatenate([nlo[:, j * d:(j + 1) * d],
                          nhi[:, j * d:(j + 1) * d]], axis=1)
         for j in range(g)], axis=1)


def _lane_split_butterfly(v, tw, half: int, dif: bool):
    """Butterfly within lanes, half >= 128 (minor reshape stays
    tile-aligned). v: (16, 8, blk); tw: (16, blk) tiled pattern."""
    import jax.numpy as jnp
    blk = v.shape[-1]
    nb = blk // (2 * half)
    u = v.reshape(16, 8, nb, 2, half)
    lo, hi = u[..., 0, :], u[..., 1, :]
    twl = tw[:, :half].reshape(16, 1, 1, half)
    nlo, nhi = _bf(lo, hi, jnp.broadcast_to(twl, lo.shape), dif)
    return jnp.stack([nlo, nhi], axis=-2).reshape(16, 8, blk)


def _lane_roll_butterfly(v, tw, half: int, dif: bool):
    """Butterfly within lanes, half < 128: roll form (a sub-tile minor
    reshape would relayout); the twiddle mul runs on ALL lanes."""
    import jax
    import jax.numpy as jnp
    from .field import FR
    lane = jax.lax.broadcasted_iota(jnp.uint32, (v.shape[-1],), 0)
    bit = ((lane & half) != 0)[(None,) * 2]
    # FieldOps.mul sizes its CIOS state from the FIRST operand's batch:
    # broadcast the twiddle row up front
    twb = jnp.broadcast_to(tw[:, None], v.shape)
    if dif:
        return jnp.where(
            bit,
            FR.mul(twb, FR.sub(jnp.roll(v, half, axis=-1), v)),
            FR.add(v, jnp.roll(v, -half, axis=-1)))
    m = FR.mul(twb, v)
    return jnp.where(
        bit,
        FR.sub(jnp.roll(v, half, axis=-1), m),
        FR.add(v, jnp.roll(m, -half, axis=-1)))


def ntt_fused_pass(x4, stages, dif: bool, pre_mul=None):
    """Run `stages` (execution-ordered) in ONE kernel over
    x4: (16, BM, 8, Cp) u32. Stage descriptors (built by
    ops/ntt._fused_descs):

      {"kind": "axis",  "k": 0..2, "tw": (16, 2^k, Cp)}
      {"kind": "split", "half": >=128, "tw": (16, blk) tiled}
      {"kind": "roll",  "half": <128,  "tw": (16, blk) tiled}

    pre_mul: optional (rows, M, 8, Cp) table (rows 8 = packed pairs)
    multiplied in BEFORE the butterflies — the coset-shift fold; its M
    axis is indexed modulo M (batch polys share the table).
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .field import FR
    from .msm import unpack_limb_rows

    BM, Cp = x4.shape[1], x4.shape[3]
    blk = min(int(os.environ.get("RSTPU_NTT_BLOCK", 2048)), Cp)
    assert Cp % blk == 0
    has_lane = any(s["kind"] != "axis" for s in stages)
    assert not (has_lane and blk != Cp), "lane stages need blk == Cp"
    nst = len(stages)

    def kernel(*refs):
        i = 0
        pm_ref = None
        if pre_mul is not None:
            pm_ref = refs[0]
            i = 1
        x_ref = refs[i]
        tw_refs = refs[i + 1: i + 1 + nst]
        o_ref = refs[-1]
        v = x_ref[:][:, 0]                       # (16, 8, blk)
        with _kernel_ctx():
            if pm_ref is not None:
                pm = pm_ref[:][:, 0]
                v = FR.mul(v, unpack_limb_rows(pm) if pm.shape[0] == 8
                           else pm)
            for s, tr in zip(stages, tw_refs):
                tw = tr[:]
                if s["kind"] == "axis":
                    v = _axis_butterfly(v, tw, s["k"], dif)
                elif s["kind"] == "split":
                    v = _lane_split_butterfly(v, tw[:, 0], s["half"], dif)
                else:
                    v = _lane_roll_butterfly(v, tw[:, 0], s["half"], dif)
        o_ref[:] = v[:, None]

    x_spec = pl.BlockSpec((16, 1, 8, blk), lambda i, j: (0, i, 0, j),
                          memory_space=pltpu.VMEM)
    in_specs = []
    args = []
    if pre_mul is not None:
        M = pre_mul.shape[1]
        in_specs.append(pl.BlockSpec(
            (pre_mul.shape[0], 1, 8, blk),
            lambda i, j, M=M: (0, i % M, 0, j),
            memory_space=pltpu.VMEM))
        args.append(pre_mul)
    in_specs.append(x_spec)
    args.append(x4)
    for s in stages:
        if s["kind"] == "axis":
            d = s["tw"].shape[1]
            in_specs.append(pl.BlockSpec(
                (16, d, blk), lambda i, j: (0, 0, j),
                memory_space=pltpu.VMEM))
            args.append(s["tw"])
        else:
            in_specs.append(pl.BlockSpec(
                (16, 1, blk), lambda i, j: (0, 0, 0),
                memory_space=pltpu.VMEM))
            args.append(s["tw"][:, None])

    return pl.pallas_call(
        kernel,
        grid=(BM, Cp // blk),
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x4.shape, jnp.uint32),
        interpret=jax.default_backend() == "cpu",
    )(*args)


def ntt_tail(x, tws_by_half, dif: bool):
    """ALL butterfly stages with half < 128 fused into ONE kernel.

    For half < 128 every XOR-partner lives inside one 128-lane tile, so
    the whole tail runs in VMEM with lane-local rolls — none of the
    (…, nblk, 2, half) stage reshapes whose 16-lane trailing axes get
    8x TPU layout padding (the 2^24 front OOM: an 8 GB HLO temp for a
    1 GB poly), and no HBM round trips between the 7 stages. Per stage
    the twiddle product runs on ALL lanes (2x the mul work of the
    split form; these stages are <1/3 of the transform):

      DIF: out[j] = bit(j,h) ? tw * (x[j-h] - x[j]) : x[j] + x[j+h]
      DIT: m = tw * x;  out[j] = bit(j,h) ? x[j-h] - m[j] : x[j] + m[j+h]

    x: (16, *batch, n) u32; tws_by_half: {half: (16, half)} UNPACKED
    twiddle rows. Stage order: descending halves for DIF, ascending
    for DIT. Falls back to plain XLA ops off-TPU.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .field import FR

    halves = sorted(tws_by_half, reverse=dif)
    n = x.shape[-1]
    shape = x.shape
    blk = min(int(os.environ.get("RSTPU_NTT_BLOCK", 2048)), n)

    def fb(xx, tw_of):
        lane = jax.lax.broadcasted_iota(jnp.uint32, (xx.shape[-1],), 0)
        out = xx
        for h in halves:
            tw = tw_of(h, xx.shape[-1])
            bit = ((lane & h) != 0)[(None,) * (out.ndim - 1)]
            if dif:
                val = jnp.where(
                    bit,
                    FR.mul(tw, FR.sub(jnp.roll(out, h, axis=-1), out)),
                    FR.add(out, jnp.roll(out, -h, axis=-1)))
            else:
                m = FR.mul(tw, out)
                val = jnp.where(
                    bit,
                    FR.sub(jnp.roll(out, h, axis=-1), m),
                    FR.add(out, jnp.roll(m, -h, axis=-1)))
            out = val
        return out

    if not enabled() or n % blk or int(np.prod(shape[1:])) < 2 * blk:
        def tw_direct(h, width):
            t = jnp.tile(tws_by_half[h], (1, width // h))
            return t.reshape((16,) + (1,) * (x.ndim - 2) + (width,))
        return fb(x, tw_direct)

    flat = x.reshape(16, -1)  # blocks never straddle batch: blk | n
    tiles = [jnp.tile(tws_by_half[h], (1, blk // h)) for h in halves]

    def kernel(*refs):
        x_ref, tw_refs, o_ref = refs[0], refs[1:-1], refs[-1]
        tw_map = {h: r[:] for h, r in zip(halves, tw_refs)}
        with _kernel_ctx():
            o_ref[:] = fb(x_ref[:], lambda h, _w: tw_map[h])

    spec = pl.BlockSpec((16, blk), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((16, blk), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(flat.shape[1] // blk,),
        in_specs=[spec] + [tw_spec] * len(tiles),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.uint32),
        interpret=jax.default_backend() == "cpu",
    )(flat, *tiles)
    return out.reshape(shape)
