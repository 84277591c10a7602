"""TPU-native Groth16 prover: the full proving pipeline as ONE jitted
device program.

Implements the reference hot path /root/reference/src/groth16.cpp:49-254
(SURVEY.md §3.1) with TPU-idiomatic replacements for each stage:

  reference (C++ / OpenMP / asm)          here (JAX / XLA)
  ------------------------------------    --------------------------------
  striped-omp-lock coef scatter (63-85)   mont_mul + segment_sum in
                                          deferred-carry limb space
  pointwise a*b, h (89-96, 157-166)       batched limb-vector field ops
  ffiasm FFT<Fr> coset FFTs (99-155)      ops/ntt radix-2 NTT, a/b/c
                                          batched in one instantiation
  ffiasm multiMulByScalar x5 (173-204)    ops/msm sort+scan Pippenger; the
                                          four G1 MSMs ride ONE batched
                                          call (4x wider vector lanes)
  libsodium r/s (209-217)                 os.urandom 31-byte convention
  proof assembly (222-246)                exact host-side EC math on the
                                          per-window MSM totals

Representation pipeline preserved bit-for-bit (SURVEY.md §3.1): witness
values stay standard-form, zkey tables stay Montgomery, h scalars get the
extra fromMontgomery, MSMs consume plain little-endian integers. Given
the same (r, s) the emitted proof is byte-identical to the reference's.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .io.zkey import ZKey
from .ops import field as FF
from .ops.field import FR
from .ops.curve import G1P, G2P
from .ops import msm as MSM
from .ops.ntt import NTTPlan, to_odd_coset
from .ref.field import R_FR
from .ref.groth16 import Proof, sample_rs
from .utils import points as PT


def _log2(n: int) -> int:
    p = n.bit_length() - 1
    assert 1 << p == n, "domainSize must be a power of two"
    return p


def _pad_points(pts: np.ndarray, npad: int) -> np.ndarray:
    n, k = pts.shape[0], pts.shape[1]
    if n == npad:
        return pts
    return np.concatenate(
        [pts, np.zeros((npad - n, k, 8), np.uint32)], axis=0)


@functools.partial(
    jax.jit, static_argnames=("c_bits", "window_group", "segment", "mesh",
                              "g1_blocked"),
    donate_argnums=(2,))
def _msm_stage(pts_g1, pts_g2, rows3, *, c_bits: int,
               window_group: int, segment: int, mesh,
               g1_blocked: bool = False):
    """Stage 2: the five MSMs (groth16.cpp:173-204) — four G1 rides one
    batched call, G2 reuses the witness scalar row. A module-level jit
    keyed ONLY on the MSM config: every circuit with the same
    (nmax, c, G, segment, mesh) shares this compiled executable
    regardless of its domain/coefficient structure.

    rows3: ONE (3, nmax, 8) stack [h, wit, c] (built and donated by the
    front's final stage) — at 2^24 the rows are 1.6 GB, and separate
    h/wit/c arrays re-stacked here would double that next to the
    resident tables (the round-4 2^24 OOM).

    g1_blocked is an EXPLICIT static flag (Prover.g1_blocked): the
    round-4 regression came from three call sites inferring the layout
    from leaf ndims — layout dispatch is never sniffed again."""
    h_row, wit_row, c_row = rows3[0], rows3[1], rows3[2]
    if mesh is None:
        if g1_blocked:
            g1w = _g1_blocked_body(pts_g1, rows3, c_bits, window_group,
                                   segment)
        else:
            g1_sc = jnp.stack([h_row, wit_row, wit_row, c_row])
            g1w = MSM.msm(G1P, pts_g1, g1_sc, c_bits, window_group,
                          combine=False, segment=segment)
        g2w = MSM.msm(G2P, pts_g2, wit_row[None], c_bits, window_group,
                      combine=False, segment=segment)
    else:
        from .parallel import pmsm
        g1_sc = jnp.stack([h_row, wit_row, wit_row, c_row])
        g1w = pmsm.msm_sharded(G1P, pts_g1, g1_sc, c_bits, mesh,
                               window_group, combine=False,
                               segment=segment)
        g2w = pmsm.msm_sharded(G2P, pts_g2, wit_row[None], c_bits, mesh,
                               window_group, combine=False,
                               segment=segment)
    return g1w, g2w


def _g1_blocked_body(pts_g1, rows3, c_bits, window_group, segment):
    """Blocked G1 tables — a tuple of TWO (x, y) blocks with leaves
    (8, 2, nmax) (Prover.__init__, config.g1_blocked): the 4-row
    batch's scan working set + scalar-side buffers do not fit HBM next
    to the resident 2^23+ tables. The two blocks ([H,A] with scalar
    rows [h,wit], then [B1,C] with [wit,c]) run through the MSM body
    SEQUENTIALLY in one program; scalar rows are dynamic 2-slices of
    the (3, nmax, 8) stack so wit_row is never duplicated. Outputs
    concatenate back to the flat path's (16, W, 4) batch order."""
    outs = []
    for b in range(2):
        outs.append(MSM.msm(G1P, pts_g1[b], rows3, c_bits, window_group,
                            combine=False, segment=segment,
                            row_slice=(jnp.int32(b), 2)))
    return jax.tree.map(
        lambda a0, a1: jnp.concatenate([a0, a1], axis=2), *outs)


# 2^23+ single-chip path: the G1 and G2 MSMs run as SEPARATE XLA
# programs. In one program the two MSMs are independent computations,
# so the latency-hiding scheduler may interleave them and their
# working sets (decompose glue, sort/gather buffers, within-arrays)
# ADD in the buffer-assignment peak — the measured round-4 2^24 OOM
# even after the front fit. Two programs serialize on the device
# stream, so each peak stands alone. The same logic splits the G1 MSM
# further: each 2-row BLOCK is its own dispatch of ONE shared compiled
# program (row_lo is traced, so both calls hit the same executable),
# and Prover.prove fetches block 0's totals before dispatching block 1.
#
# LAYOUT PINNING (TPU only): left to itself, XLA's layout assignment
# relayouts the big parameters at program entry — a 1.5 GiB copy of
# rows3 ({1,2,0:T(8,128)} -> {1,0,2:T(4,128)}) and 1.0 GiB of x-table
# copies ({2,1,0:T(2,128)} -> {2,0,1:T(8,128)}) inside the G1 block,
# 2.0 GiB of table copies inside the G2 stage — measured 2.5 of the
# 3.6 GiB program temp at 2^24 and the difference between fitting HBM
# next to the resident tables and the round-4/5 RESOURCE_EXHAUSTED.
# The fix: upload the tables and emit the rows stack ALREADY in the
# layouts the MSM programs prefer, and pin the programs' entry layouts
# to match (jax.experimental.layout.Format), so no copy exists on
# either side of the boundary.

# major_to_minor orders the MSM programs prefer (read off the
# unpinned programs' chosen entry/internal layouts at 2^24):
_MTM_PTS_X = (1, 0, 2)    # (8, B, n) x-tables: {2,0,1:T(8,128)}
_MTM_PTS_Y = (0, 1, 2)    # y-tables keep the row-major default
_MTM_ROWS = (2, 0, 1)     # (3, nmax, 8) rows:  {1,0,2:T(4,128)}


def _fmt(mtm):
    """Format for the default device, or None off-TPU (CPU tests: the
    CPU backend has no tiled layouts and pinning would only restrict
    the compiler)."""
    dev = jax.devices()[0]
    if dev.platform != "tpu":
        return None
    from jax.experimental.layout import Format, Layout
    return Format(Layout(major_to_minor=mtm),
                  jax.sharding.SingleDeviceSharding(dev))


def _park_sharding():
    """pinned_host sharding on the default device (stage paging)."""
    return jax.sharding.SingleDeviceSharding(jax.devices()[0],
                                             memory_kind="pinned_host")


def _unpark(tree, fmt=None):
    """pinned_host -> HBM, optionally into a pinned entry layout."""
    tgt = fmt or jax.sharding.SingleDeviceSharding(jax.devices()[0])
    return jax.tree.map(lambda a: jax.device_put(a, tgt), tree)


def _g1_block_impl(pts_blk, rows3, row_lo, c_bits, window_group,
                   segment):
    return MSM.msm(G1P, pts_blk, rows3, c_bits, window_group,
                   combine=False, segment=segment, row_slice=(row_lo, 2))


def _g2_stage_impl(pts_g2, rows3, c_bits, window_group, segment):
    return MSM.msm(G2P, pts_g2, rows3[1][None], c_bits, window_group,
                   combine=False, segment=segment)


@functools.cache
def _g1_block_jit(pin: bool):
    # statics are positional: pjit rejects kwargs once in_shardings is
    # given, and in_shardings covers only the dynamic leading args
    kw = {}
    if pin:
        sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        kw["in_shardings"] = ((_fmt(_MTM_PTS_X), _fmt(_MTM_PTS_Y)),
                              _fmt(_MTM_ROWS), sh)
    return jax.jit(_g1_block_impl, static_argnums=(3, 4, 5), **kw)


@functools.cache
def _g2_stage_jit(pin: bool):
    kw = {}
    if pin:
        fx = _fmt(_MTM_PTS_X)
        kw["in_shardings"] = (((fx, fx), (fx, fx)), _fmt(_MTM_ROWS))
    return jax.jit(_g2_stage_impl, static_argnums=(2, 3, 4),
                   donate_argnums=(1,), **kw)


@functools.cache
def _rows_fn(cfg, pin: bool):
    """Rows-stack emitter for the staged front; `pin` additionally
    pins the output to the MSM programs' rows entry layout."""
    n, n_vars, n_public, n_c, nmax = cfg

    def impl(witness, hp):
        return _build_rows(witness, hp, n, n_vars, n_public, n_c, nmax)

    kw = {}
    if pin:
        f = _fmt(_MTM_ROWS)
        if f is not None:
            kw["out_shardings"] = f
    return jax.jit(impl, donate_argnums=(0, 1), **kw)


def _build_rows(witness, hp, n, n_vars, n_public, n_c, nmax):
    rows = jnp.zeros((3, nmax, 8), jnp.uint32)
    rows = rows.at[0, :n].set(hp.T)
    rows = rows.at[1, :n_vars].set(witness)
    rows = rows.at[2, :n_c].set(witness[n_public + 1:])
    return rows


def _msm_g1_block(pts_blk, rows3, row_lo, *, c_bits, window_group,
                  segment, pin=False):
    return _g1_block_jit(bool(pin))(
        pts_blk, rows3, row_lo, c_bits, window_group, segment)


def _msm_g2_stage(pts_g2, rows3, *, c_bits, window_group, segment,
                  pin=False):
    return _g2_stage_jit(bool(pin))(
        pts_g2, rows3, c_bits, window_group, segment)


class Prover:
    """One circuit's proving context: device-resident zkey tables + the
    jitted pipeline. The analogue of Groth16::Prover (groth16.hpp:39-98) —
    construction uploads the point tables once and precomputes NTT
    twiddles (the reference's `new FFT<Fr>(domainSize*2)`, groth16.hpp:94).
    """

    def __init__(self, zkey: ZKey, window_bits: Optional[int] = None,
                 window_group: Optional[int] = None, mesh=None,
                 segment: Optional[int] = None):
        # NOTE: the zkey is consumed here, not retained — every table is
        # repacked into device arrays / host ints during construction, so
        # the caller may zkey.close() as soon as this returns and the
        # multi-GB map is reclaimed (the reference keeps its malloc'd
        # copy alive forever, binfile_utils.cpp:28-31).
        self.n_vars = zkey.n_vars
        self.n_public = zkey.n_public
        self.domain = zkey.domain_size
        self.power = _log2(self.domain)
        self.n_c = zkey.points_c.shape[0]
        self.mesh = mesh

        if zkey.r != R_FR:
            raise ValueError(
                "zkey curve is not bn128")  # main_prover.cpp:46-48 semantics

        # one padded length for all five MSMs so the four G1 MSMs stack
        # on a batch axis and G2 reuses the same scalar row
        if mesh is None:
            self.nmax = MSM.pad_len(max(self.domain, self.n_vars))
        else:
            from .parallel import pmsm
            self.nmax = pmsm.pad_len_sharded(
                max(self.domain, self.n_vars), mesh.shape[pmsm.AXIS])
        from . import config
        self.ntt_seq = config.ntt_sequential(self.power)
        # API argument wins over the env knob (SURVEY §5.6: explicit
        # configuration, not process-global mutation)
        self.segment = (segment if segment is not None
                        else config.msm_segment(self.nmax))
        if self.segment and self.nmax % self.segment:
            self.segment = 0  # odd sizes: fall back to whole-axis scan
        self.c_bits = (window_bits or config.window_bits()
                       or MSM.best_window_bits(self.nmax, self.segment))
        self.window_group = window_group or config.window_group(self.nmax)

        # --- device point tables: PACKED affine, G1 stacked (8, 4, nmax)
        # The zkey's on-disk u32 words ARE the packed device layout (two
        # 16-bit limbs per word): no limb expansion or re-packing, just a
        # transpose per coordinate (half the HBM footprint and half the
        # sort-gather bytes on the MSM hot path, ops/msm.py)
        stacked = np.stack([
            _pad_points(zkey.points_h, self.nmax),
            _pad_points(zkey.points_a, self.nmax),
            _pad_points(zkey.points_b1, self.nmax),
            _pad_points(zkey.points_c, self.nmax),
        ])                                   # (4, nmax, 2, 8)
        # explicit layout flag — every consumer (pipeline/_msm_stage/
        # prove) branches on THIS, never on leaf ranks
        self.g1_blocked = bool(mesh is None and config.g1_blocked(self.nmax))
        # STAGE PAGING (the 2^24 single-chip fit, round 5): on the
        # blocked path every big table PARKS in the TPU's pinned_host
        # memory and is unparked into HBM only for the stage that reads
        # it (front: coefficients+twiddles; each G1 block and the G2
        # stage: its own point table). HBM during any one stage holds
        # just that stage's arguments + temps — the measured backend
        # refuses programs once touched residency + temps approach
        # ~10 GiB, far below the chip's nominal 16. pinned_host <->
        # HBM moves run at PCIe speed (~0.01 s/GiB measured), paid per
        # prove; CPU tests keep plain device arrays.
        self.paged = bool(self.g1_blocked
                          and jax.devices()[0].platform == "tpu")
        # entry-layout pinning is OFF by default: combining pinned
        # entry formats with pinned_host unparking hard-crashes the TPU
        # compiler's tiling assignment (Check failed: minor_to_major,
        # tpu_post_fusion_tiling_assignment.cc — observed at both tiny
        # and 2^24 shapes), and with stage paging the ~2.5 GiB of entry
        # relayout copies fit the per-stage budget anyway (args 3.6 +
        # temp 3.6 ~ 7.2 GiB vs the ~8+ GiB ceiling). RSTPU_PIN_LAYOUTS=1
        # re-enables for experiments.
        import os as _os
        self.pin_layouts = bool(
            self.paged and self.nmax >= (1 << 22)
            and _os.environ.get("RSTPU_PIN_LAYOUTS") == "1")
        park = _park_sharding() if self.paged else None
        if self.g1_blocked:
            # two SEPARATE (8, 2, nmax) blocks [H,A] / [B1,C]: the
            # big-domain G1 MSM runs ONE compiled block program twice
            # (prove below); each block unparks alone.
            blk = stacked.reshape(2, 2, self.nmax, 2, 8)

            def put(a):
                return (jnp.asarray(a) if park is None
                        else jax.device_put(a, park))

            self.pts_g1 = tuple(
                (put(np.moveaxis(blk[b, :, :, 0, :], -1, 0)),
                 put(np.moveaxis(blk[b, :, :, 1, :], -1, 0)))
                for b in range(2))           # 2 x leaves (8, 2, nmax)
        else:
            x = jnp.asarray(np.moveaxis(stacked[:, :, 0, :], -1, 0))
            y = jnp.asarray(np.moveaxis(stacked[:, :, 1, :], -1, 0))
            self.pts_g1 = (x, y)             # leaves (8, 4, nmax)

        b2 = _pad_points(zkey.points_b2, self.nmax)[None]  # (1, nmax, 4, 8)
        cs = [jnp.asarray(np.moveaxis(b2[:, :, k, :], -1, 0))
              for k in range(4)]
        # one-time rescale onto the cheap-b3 iso-twist (ops/curve.py
        # G2P_ISO): the G2 MSM scan runs there, msm() maps window
        # totals back, so everything downstream stays on the zkey twist
        self.pts_g2 = MSM.g2_rescale_packed(((cs[0], cs[1]),
                                             (cs[2], cs[3])))
        if self.paged:
            self.pts_g2 = jax.tree.map(
                lambda a: jax.device_put(a, park), self.pts_g2)

        if mesh is not None:
            from .parallel import multihost, pmsm
            self.pts_g1 = jax.tree.map(
                lambda a: multihost.put_sharded(a, mesh, pmsm.point_spec(3)),
                self.pts_g1)
            self.pts_g2 = jax.tree.map(
                lambda a: multihost.put_sharded(a, mesh, pmsm.point_spec(3)),
                self.pts_g2)

        # --- vk points as host ref affine (assembly runs host-side) ------
        self.ref_vk = {
            "alpha1": _ref_g1_from_limbs(zkey.vk_alpha1),
            "beta1": _ref_g1_from_limbs(zkey.vk_beta1),
            "delta1": _ref_g1_from_limbs(zkey.vk_delta1),
            "beta2": _ref_g2_from_limbs(zkey.vk_beta2),
            "delta2": _ref_g2_from_limbs(zkey.vk_delta2),
        }

        # --- coefficient table (zkey section 4) --------------------------
        # TPU-idiomatic replacement for the reference's striped-lock
        # scatter (groth16.cpp:63-85), redesigned scatter-FREE: records
        # are binned by target row (a|b, constraint) ON THE HOST at load
        # time into K fixed slots per row, so the device accumulation is
        # a pure reshape-reduce — gather witness rows, one mont_mul, sum
        # over the K slot axis. (jax.ops.segment_sum lowers to a TPU
        # scatter that measured ~25x slower than the arithmetic it
        # feeds.) Rows denser than K spill to a LEFTOVER segment-sum
        # pass; rows denser than 2^15 (the deferred-carry headroom:
        # limb column sums must stay < 2^31) additionally go through a
        # two-level subsegment pass, so any density is handled.
        n = self.domain
        seg = zkey.coef_m.astype(np.int64) * n + zkey.coef_c.astype(np.int64)
        ncoefs = seg.shape[0]
        coef_s = zkey.coef_s.astype(np.int32)
        coef_val = np.asarray(zkey.coef_val)        # (nCoefs, 8) Montgomery
        counts = np.bincount(seg, minlength=2 * n)
        order = np.argsort(seg, kind="stable")
        starts = np.zeros(2 * n, np.int64)
        starts[1:] = np.cumsum(counts)[:-1]
        rank = np.empty(ncoefs, np.int64)
        rank[order] = np.arange(ncoefs) - starts[seg[order]]
        # smallest K with <= 5% of records spilling (K = typical row
        # density; sqchain/R1CS rows have 1-3 terms per side)
        K = 1
        while (np.count_nonzero(rank >= K) > 0.05 * ncoefs
               and K < 16):
            K += 1
        self.coef_slots = K
        main = rank < K
        slot = (seg[main] * K + rank[main]).astype(np.int64)
        s_pad = np.zeros(2 * n * K, np.int32)       # dummy -> wire 0
        v_pad = np.zeros((2 * n * K, 8), np.uint32)  # dummy -> coef 0
        s_pad[slot] = coef_s[main]
        v_pad[slot] = coef_val[main]
        # paged mode: the front-only tables (coefficients + NTT
        # twiddles, ~1.8 GiB at 2^24) park in pinned_host too and ride
        # into HBM per prove as prove-local buffers that die before the
        # MSM stage dispatches (see the stage-paging note above)
        if self.paged:
            _park = _park_sharding()
            _dev = lambda a: jax.device_put(np.asarray(a), _park)  # noqa: E731
        else:
            _dev = jnp.asarray
        self.coef_s = _dev(s_pad)
        self.coef_val = _dev(v_pad)
        # leftover records (rank >= K): segment-sum path, two-level when
        # a row exceeds the 2^15-term deferred-carry headroom
        left = np.nonzero(~main)[0]
        cap = 1 << 15
        self.left_s = self.left_val = self.left_seg = None
        self.acc2_seg = None
        self.acc1_segments = 0
        if left.size:
            lseg = seg[left]
            lrank = rank[left] - K
            self.left_s = _dev(coef_s[left])
            self.left_val = _dev(coef_val[left])
            if int(counts.max()) - K < cap:
                self.left_seg = _dev(lseg.astype(np.int32))
                self.acc1_segments = 2 * n
            else:
                nsub = (int(counts.max()) - K - 1) // cap + 1
                if nsub >= cap:
                    raise ValueError("coefficient section too dense "
                                     "(> 2^30 terms on one row)")
                key = lseg * nsub + (lrank >> 15)
                uniq, inv = np.unique(key, return_inverse=True)
                self.left_seg = _dev(inv.astype(np.int32))
                self.acc1_segments = int(uniq.shape[0])
                self.acc2_seg = _dev((uniq // nsub).astype(np.int32))

        # --- NTT plan for the proving domain ------------------------------
        plan = NTTPlan(self.power)
        arrays = plan.arrays()
        if mesh is None:
            # the coset pipeline touches only these three; drop the
            # rest (bitrev/ninv/coset are ~1.1 GiB of dead residency at
            # 2^24), and store them PACKED at 2^20+ (halves residency;
            # ops/ntt unpacks per-stage slices)
            keep = ("fwd_tw", "inv_tw", "coset_ninv_br")
            arrays = {k: v for k, v in arrays.items() if k in keep}
            if self.power >= 20:
                arrays = {k: MSM.pack_limb_rows(v) for k, v in arrays.items()}
        self.ntt_arrays = {k: _dev(np.asarray(v))
                           for k, v in arrays.items()}
        self.eta = plan.eta

        # distributed four-step NTT when the domain splits over the mesh
        self.dntt_plan = None
        self.dntt_arrays = {}
        if mesh is not None:
            from .parallel.pntt import DNTTPlan
            try:
                self.dntt_plan = DNTTPlan(self.power,
                                          mesh.shape["shard"])
                self.dntt_arrays = self.dntt_plan.arrays()
            except ValueError:
                self.dntt_plan = None  # tiny domain: replicated NTT

        # multi-controller jobs: non-sharded tables must be GLOBAL
        # (replicated) arrays — a locally-committed array cannot enter
        # a jit over the global mesh (parallel/multihost.py)
        if mesh is not None and jax.process_count() > 1:
            from .parallel import multihost

            def rep(a):
                return multihost.replicate(np.asarray(a), mesh)

            self.coef_s = rep(self.coef_s)
            self.coef_val = rep(self.coef_val)
            for name in ("left_s", "left_val", "left_seg", "acc2_seg"):
                v = getattr(self, name)
                if v is not None:
                    setattr(self, name, rep(v))
            self.ntt_arrays = {k: rep(v)
                               for k, v in self.ntt_arrays.items()}
            self.dntt_arrays = {k: rep(v)
                                for k, v in self.dntt_arrays.items()}

        self.last_phases: Dict[str, float] = {}
        # jit static key: equal-config Provers share ONE compiled
        # executable (self is static_argnums=0 in _front_jit; without
        # this, every instance would recompile the pipeline)
        mesh_key = None if mesh is None else (
            tuple(mesh.shape.items()), tuple(str(d) for d in
                                             mesh.devices.flat))
        nleft = 0 if self.left_s is None else self.left_s.shape[0]
        self._config_key = (self.n_vars, self.n_public, self.domain,
                            self.n_c, self.nmax, self.c_bits,
                            self.window_group, self.segment, self.ntt_seq,
                            zkey.n_coefs, self.coef_slots, nleft,
                            self.acc1_segments, self.g1_blocked, mesh_key)

    def __hash__(self):
        return hash(self._config_key)

    def __eq__(self, other):
        return (isinstance(other, Prover)
                and self._config_key == other._config_key)

    # -- the fused pipeline (ONE jitted program) ----------------------------

    def tables(self) -> dict:
        """Device tables passed as jit ARGUMENTS (never closed over: a
        captured jnp array becomes an HLO constant and XLA's constant
        passes choke on multi-GB literals)."""
        if getattr(self, "released", False):
            raise RuntimeError(
                "Prover.release() was called; construct a new Prover")
        out = {
            "pts_g1": self.pts_g1, "pts_g2": self.pts_g2,
            "coef_s": self.coef_s, "coef_val": self.coef_val,
            "ntt": self.ntt_arrays, "dntt": self.dntt_arrays,
        }
        for name in ("left_s", "left_val", "left_seg", "acc2_seg"):
            v = getattr(self, name)
            if v is not None:
                out[name] = v
        return out

    def pipeline(self, witness, tables):
        """witness: (nVars, 8) u32 words, standard-form (Wtns.values
        as stored in the wtns section-2 payload); tables:
        self.tables(). Returns (g1_windows, g2_windows): per-window
        Pippenger totals, leaves (16, W, 4) / (16, W, 1) — W*5 points.

        The ~256-doubling window combine and the randomized assembly
        (groth16.cpp:209-246) run on the HOST afterwards (see prove):
        they are O(W) exact EC ops on single points, which as device code
        would cost thousands of sequential single-lane steps.

        Jittable as a single XLA program (__graft_entry__.entry exposes
        it to the driver); `Prover.prove` runs the same computation as
        TWO jitted stages (front / msms) so the expensive MSM module is
        compiled once per (nmax, c, G, segment, mesh) config and shared
        across circuits — front-end changes (domain, coefficient table)
        never recompile the MSMs.
        """
        rows3 = self.front(witness, tables)
        return _msm_stage(tables["pts_g1"], tables["pts_g2"],
                          rows3, c_bits=self.c_bits,
                          window_group=self.window_group,
                          segment=self.segment, mesh=self.mesh,
                          g1_blocked=self.g1_blocked)

    def front(self, witness, tables):
        """Stage 1: witness -> the five MSM scalar rows (plain LE packed
        integers). Covers groth16.cpp:52-166: coefficient accumulation,
        pointwise products, coset NTTs, h scalars."""
        ab, cvec = self._acc(witness, tables)
        a2, b2, c2 = self._cosets(ab, cvec, tables)
        hp = self._h_poly(a2, b2, c2)
        return self._rows(witness, hp)

    def _acc(self, witness, tables):
        """Coefficient accumulation + pointwise product: witness ->
        (ab (16, 2, N), cvec (16, N)) canonical evaluations."""
        n = self.domain

        # --- witness -> a, b, c evaluations (groth16.cpp:52-96) ----------
        # witness arrives PACKED (nVars, 8) — the wtns section-2 payload
        # uploaded AS-IS (upload is tunnel-bandwidth-bound, PERF.md, so
        # only payload bytes move and the transpose happens on device).
        # Records were host-binned into K slots per target row (see
        # __init__): the accumulation is gather + mul + a reshape-reduce
        # over the slot axis — no device scatter.
        K = self.coef_slots

        def slot_acc(args):
            s, v = args                                  # (m, 8) each
            w = MSM.unpack_limb_rows(
                jnp.take(witness, s, axis=0).T)          # (16, m)
            cv = MSM.unpack_limb_rows(v.T)
            prod = FR.mul(w, cv)                         # standard-form
            return FF.pack(prod).reshape(-1, K, 16).sum(
                axis=1, dtype=jnp.uint32)                # (m/K, 16)

        rows_per_chunk = max((1 << 21) // K, 1)
        if 2 * n > rows_per_chunk and (2 * n) % rows_per_chunk == 0:
            # big domains: the full-width gather+mul holds ~200 bytes of
            # CIOS temporaries per record lane — at 2^24 that alone
            # overflows HBM next to the resident tables (round-3 OOM:
            # 24 G needed of 15.75 G). lax.map over fixed row chunks
            # caps the working set at ~0.5 GB.
            nch = (2 * n) // rows_per_chunk
            acc = jax.lax.map(
                slot_acc,
                (tables["coef_s"].reshape(nch, rows_per_chunk * K),
                 tables["coef_val"].reshape(nch, rows_per_chunk * K, 8)))
            acc = acc.reshape(2 * n, 16)
        else:
            acc = slot_acc((tables["coef_s"], tables["coef_val"]))

        if "left_s" in tables:
            # spilled records (> K terms on a row): segment-sum pass;
            # two-level when a row exceeds the 2^15-term carry headroom
            lwp = jnp.take(witness, tables["left_s"], axis=0)
            lprod = FR.mul(MSM.unpack_limb_rows(lwp.T),
                           MSM.unpack_limb_rows(tables["left_val"].T))
            lacc = jax.ops.segment_sum(FF.pack(lprod), tables["left_seg"],
                                       num_segments=self.acc1_segments)
            if self.acc2_seg is not None:
                m1 = self.acc1_segments
                lacc = jnp.concatenate(
                    [lacc, jnp.zeros((m1, 2), jnp.uint32)], axis=1)
                mid = FR.reduce_wide(FF.unpack(lacc))    # canonical
                lacc = jax.ops.segment_sum(
                    FF.pack(mid), tables["acc2_seg"], num_segments=2 * n)
            acc = acc + lacc                             # columns < 2^31

        acc = jnp.concatenate(
            [acc, jnp.zeros((2 * n, 2), jnp.uint32)], axis=1)  # carry room
        rch = 1 << 22
        if 2 * n > rch:  # chunk the canonicalizing muls (HBM, see above)
            red = jax.lax.map(
                lambda a: FF.pack(FR.reduce_wide(FF.unpack(a))),
                acc.reshape((2 * n) // rch, rch, 18))
            ab = FF.unpack(red.reshape(2 * n, 16))
        else:
            ab = FR.reduce_wide(FF.unpack(acc))          # (16, 2N) canonical
        ab = ab.reshape(16, 2, n)
        cch = 1 << 22
        if n > cch:  # chunk the full-width mul (HBM, see above)
            absplit = jnp.moveaxis(
                ab.reshape(16, 2, n // cch, cch), 2, 0)
            cvec = jnp.moveaxis(
                jax.lax.map(lambda p: FR.mul(p[:, 0], p[:, 1]), absplit),
                0, 1).reshape(16, n)
        else:
            cvec = FR.mul(ab[:, 0], ab[:, 1])            # (16, N)
        return ab, cvec

    def _cosets(self, ab, cvec, tables):
        """Coset FFTs (groth16.cpp:99-161): evaluations -> the odd-coset
        evaluations (a2, b2, c2)."""
        if self.dntt_plan is not None:
            # distributed: ifft -> eta^k shift -> fft with four-step
            # all-to-all transforms over the mesh (parallel/pntt.py)
            from .parallel.pntt import dntt
            polys = jnp.concatenate([ab, cvec[:, None]], axis=1)
            polys = dntt(polys, tables["dntt"], self.dntt_plan,
                         self.mesh, inverse=True)
            shift = jnp.broadcast_to(
                tables["ntt"]["coset"][:, None, :], polys.shape)
            polys = FR.mul(polys, shift)
            polys = dntt(polys, tables["dntt"], self.dntt_plan, self.mesh)
            a2, b2, c2 = polys[:, 0], polys[:, 1], polys[:, 2]
        elif self.ntt_seq:
            # big domains: a/b/c transformed SEQUENTIALLY and UNROLLED,
            # never stacked — each source buffer dies as its transform
            # completes (a (16, 3, N) stack is 3 GB at 2^24 and lax.map
            # would hold input + stacked output + stage temporaries,
            # the round-3 front OOM)
            a2 = to_odd_coset(ab[:, 0], tables["ntt"], self.eta)
            b2 = to_odd_coset(ab[:, 1], tables["ntt"], self.eta)
            c2 = to_odd_coset(cvec, tables["ntt"], self.eta)
        else:
            polys = jnp.concatenate([ab, cvec[:, None]], axis=1)
            polys = to_odd_coset(polys, tables["ntt"], self.eta)
            a2, b2, c2 = polys[:, 0], polys[:, 1], polys[:, 2]
        return a2, b2, c2

    def _h_poly(self, a2, b2, c2):
        """h = fromMontgomery(a2*b2 - c2) (groth16.cpp:162), PACKED."""
        n = self.domain

        def h_of(p):                                     # ((16,m),)*3
            return FR.from_mont(FR.sub(FR.mul(p[0], p[1]), p[2]))

        hch = 1 << 22
        if n > hch:
            # chunk the two full-width muls (same HBM rationale as the
            # coefficient accumulation above); chunks emit PACKED words
            # directly so the unpacked (16, N) h never materializes
            split = tuple(jnp.moveaxis(v.reshape(16, n // hch, hch), 1, 0)
                          for v in (a2, b2, c2))
            hp = jnp.moveaxis(
                jax.lax.map(lambda p: MSM.pack_limb_rows(h_of(p)), split),
                0, 1).reshape(8, n)
        else:
            hp = MSM.pack_limb_rows(h_of((a2, b2, c2)))
        return hp

    def _rows(self, witness, hp):
        """Scalar rows for the 5 MSMs (plain LE integers, packed) as
        ONE (3, nmax, 8) stack [h, wit, c] — _msm_stage slices it, so
        the rows are never re-stacked into a second 1.6 GB buffer at
        2^24 (the round-4 OOM)."""
        return _build_rows(witness, hp, self.domain, self.n_vars,
                           self.n_public, self.n_c, self.nmax)

    @functools.partial(jax.jit, static_argnums=0)
    def _front_jit(self, witness, tables):
        return self.front(witness, tables)

    # --- staged front for 2^23+ single-chip domains ------------------------
    # One fused front program needs ~22 GB of HLO temps at 2^24 (XLA
    # keeps the a/b/c polys and their NTT stage temporaries alive
    # together). Dispatching the four sub-stages as SEPARATE XLA
    # programs with input DONATION caps residency at one transform's
    # working set: each poly's buffer is reused in place and dies as
    # its successor completes.
    @functools.partial(jax.jit, static_argnums=0)
    def _acc_jit(self, witness, tables):
        return self._acc(witness, tables)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _coset_jit(self, poly, ntt_tables):
        return to_odd_coset(poly, ntt_tables, self.eta)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _ab_mul_jit(self, a2, b2):
        """m = a2 * b2, chunked; donating BOTH inputs caps the h-stage
        peak at one (16, N) poly + chunk temporaries (holding a2, b2,
        c2 together was ~3 GB of the round-4 2^24 OOM)."""
        n = self.domain
        ch = 1 << 22
        if n > ch:
            split = jnp.moveaxis(
                jnp.stack([a2, b2], axis=1).reshape(16, 2, n // ch, ch),
                2, 0)
            return jnp.moveaxis(
                jax.lax.map(lambda p: FR.mul(p[:, 0], p[:, 1]), split),
                0, 1).reshape(16, n)
        return FR.mul(a2, b2)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _h_from_jit(self, m, c2):
        """hp = pack(fromMontgomery(m - c2)), chunked."""
        n = self.domain

        def h_of(p):
            return MSM.pack_limb_rows(FR.from_mont(FR.sub(p[0], p[1])))

        ch = 1 << 22
        if n > ch:
            split = jnp.moveaxis(
                jnp.stack([m, c2], axis=1).reshape(16, 2, n // ch, ch),
                2, 0)
            return jnp.moveaxis(
                jax.lax.map(lambda p: h_of((p[:, 0], p[:, 1])), split),
                0, 1).reshape(8, n)
        return h_of((m, c2))

    def _rows_pinned(self, witness, hp):
        """Staged-path rows emitter: output layout pinned to the MSM
        programs' rows entry (blocked TPU path), so no relayout copy
        exists on either side of the program boundary."""
        cfg = (self.domain, self.n_vars, self.n_public, self.n_c,
               self.nmax)
        return _rows_fn(cfg, self.pin_layouts)(witness, hp)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _split_ab_jit(self, ab):
        return ab[:, 0], ab[:, 1]

    def _front_staged(self, witness, tables):
        if self.paged:
            # PROVE-LOCAL HBM copies of the parked front tables
            # (coefficients + NTT twiddles): unparked here, dead when
            # this frame returns — i.e., gone before the MSM stage
            # dispatches, so the MSM programs get their HBM back
            tables = dict(tables)
            for k in ("coef_s", "coef_val", "left_s", "left_val",
                      "left_seg", "acc2_seg"):
                if k in tables:
                    tables[k] = _unpark(tables[k])
            tables["ntt"] = _unpark(tables["ntt"])
        ab, cvec = self._acc_jit(witness, tables)
        a, b = self._split_ab_jit(ab)
        a2 = self._coset_jit(a, tables["ntt"])
        b2 = self._coset_jit(b, tables["ntt"])
        m = self._ab_mul_jit(a2, b2)      # a2/b2 die here, before the
        c2 = self._coset_jit(cvec, tables["ntt"])  # c transform runs
        hp = self._h_from_jit(m, c2)
        return self._rows_pinned(witness, hp)

    # -- public API ----------------------------------------------------------

    def release(self) -> None:
        """Drop every device-resident table so its HBM is reclaimed NOW.

        The per-instance jitted methods (static_argnums=0) hold `self`
        strongly in their compilation caches, so a Prover object never
        dies while the process lives — which round 4's bench learned the
        hard way: every rung's multi-GB tables stayed pinned and the run
        OOMed. The cache retains only this OBJECT; dropping the array
        attributes frees the device memory while the compiled
        executables survive and are shared by any equal-config Prover
        (__eq__/__hash__ key on _config_key). The instance cannot prove
        afterwards."""
        self.pts_g1 = self.pts_g2 = None
        self.coef_s = self.coef_val = None
        self.left_s = self.left_val = self.left_seg = self.acc2_seg = None
        self.ntt_arrays = {}
        self.dntt_arrays = {}
        self.released = True

    def prove(self, witness_words: np.ndarray,
              r: Optional[int] = None, s: Optional[int] = None
              ) -> Tuple[Proof, list]:
        """witness_words: (nVars, 8) uint32 standard-form values — the
        wtns section-2 payload reinterpreted as LE u32 words (Wtns.values).
        Returns (Proof, public signal ints)."""
        if r is None:
            r = sample_rs()
        if s is None:
            s = sample_rs()
        if self.mesh is not None and jax.process_count() > 1:
            # multi-controller: every process must assemble with the SAME
            # randomness (device results are identical; r/s enter only the
            # host-side assembly) — process 0's sample wins
            from jax.experimental import multihost_utils
            words = np.frombuffer(
                r.to_bytes(32, "little") + s.to_bytes(32, "little"),
                dtype="<u4").copy()
            words = np.asarray(
                multihost_utils.broadcast_one_to_all(words))
            buf = words.tobytes()
            r = int.from_bytes(buf[:32], "little")
            s = int.from_bytes(buf[32:], "little")
        rs = r * s % R_FR  # toMontgomery(mont_mul(r,s)), groth16.cpp:241-242
        t0 = time.perf_counter()

        wit = np.asarray(witness_words, dtype=np.uint32)
        assert wit.shape == (self.n_vars, 8)
        # uploaded in wtns payload order (nVars, 8): zero host-side
        # reshuffling; the device transposes in the jitted front
        if self.mesh is not None and jax.process_count() > 1:
            from .parallel import multihost
            witness = multihost.replicate(wit, self.mesh)
        else:
            witness = jnp.asarray(wit)

        # phase-labeled timeline mirroring the reference's LOG_TRACE
        # stages through prove() (groth16.cpp:51-202, SURVEY.md §5.1);
        # RSTPU_PROFILE=<dir> additionally captures a jax profiler trace
        import contextlib
        import os as _os
        from .utils.logger import phase
        prof_dir = _os.environ.get("RSTPU_PROFILE")
        prof = (jax.profiler.trace(prof_dir) if prof_dir
                else contextlib.nullcontext())
        self.last_phases = {}
        with prof, phase("device_pipeline", self.last_phases):
            tables = self.tables()
            with phase("front", self.last_phases):
                if (self.ntt_seq or self.paged) and self.mesh is None:
                    # (paged tables only flow through the staged front,
                    # which unparks them as prove-local buffers)
                    rows = self._front_staged(witness, tables)
                else:
                    rows = self._front_jit(witness, tables)
                jax.block_until_ready(rows)  # phase attribution (~ms)
            with phase("msms", self.last_phases):
                if self.g1_blocked:
                    # separate programs (peak isolation, see
                    # _msm_g1_block): each 2-row G1 block dispatches
                    # alone and its totals are FETCHED before the next
                    # dispatch, so each program's buffers are fully
                    # retired before the next peak. In paged mode each
                    # stage's table unparks from pinned_host into its
                    # pinned entry layout just-in-time and is dropped
                    # as soon as the stage's result is on the host.
                    pin = self.pin_layouts
                    fx = _fmt(_MTM_PTS_X) if pin else None
                    fy = _fmt(_MTM_PTS_Y) if pin else None
                    parts = []
                    for b in range(2):
                        blk = tables["pts_g1"][b]
                        if self.paged:
                            blk = (_unpark(blk[0], fx), _unpark(blk[1], fy))
                        out = _msm_g1_block(
                            blk, rows, jnp.int32(b),
                            c_bits=self.c_bits,
                            window_group=self.window_group,
                            segment=self.segment, pin=pin)
                        parts.append([np.asarray(leaf) for leaf in out])
                        del blk, out
                    g1w = [np.concatenate([p0, p1], axis=2)
                           for p0, p1 in zip(*parts)]
                    g2 = tables["pts_g2"]
                    if self.paged:
                        g2 = _unpark(g2, fx)
                    g2w = _msm_g2_stage(
                        g2, rows, c_bits=self.c_bits,
                        window_group=self.window_group,
                        segment=self.segment, pin=pin)
                    g2w = jax.tree.map(np.asarray, g2w)
                    del g2
                else:
                    g1w, g2w = _msm_stage(
                        tables["pts_g1"], tables["pts_g2"], rows,
                        c_bits=self.c_bits,
                        window_group=self.window_group,
                        segment=self.segment, mesh=self.mesh,
                        g1_blocked=False)
                    # materialize (block_until_ready lies on tunneled
                    # backends)
                    g1w = [np.asarray(leaf) for leaf in g1w]
                    g2w = jax.tree.map(np.asarray, g2w)

        # --- host: window combine + randomized assembly -------------------
        # all-projective int math (utils/hostcurve): inversion-free until
        # the three final affine outputs — the affine oracle paid one
        # inversion per group op (~1500 per proof, 0.2s+ of host time)
        t1 = time.perf_counter()
        from .utils.hostcurve import G1H, G2H
        x, y, z = g1w
        nwin = x.shape[1]

        def g1_at(w, b):
            return PT.proj_g1_int(x[:, w, b], y[:, w, b], z[:, w, b])

        pih, pi_a, pib1, pi_c = (
            G1H.combine_windows([g1_at(w, b) for w in range(nwin)],
                                self.c_bits) for b in range(4))
        x2, y2, z2 = g2w

        def g2_at(w):
            cc = lambda e: (e[0][:, w, 0], e[1][:, w, 0])  # noqa: E731
            return PT.proj_g2_int(cc(x2), cc(y2), cc(z2))

        pi_b = G2H.combine_windows([g2_at(w) for w in range(nwin)],
                                   self.c_bits)

        # randomized assembly, exactly groth16.cpp:209-246 (= ref prove)
        vk = {k: (G2H if k.endswith("2") else G1H).from_affine(v)
              for k, v in self.ref_vk.items()}
        pi_a = G1H.add(pi_a, vk["alpha1"])
        pi_a = G1H.add(pi_a, G1H.mul(vk["delta1"], r))
        pi_b = G2H.add(pi_b, vk["beta2"])
        pi_b = G2H.add(pi_b, G2H.mul(vk["delta2"], s))
        pib1 = G1H.add(pib1, vk["beta1"])
        pib1 = G1H.add(pib1, G1H.mul(vk["delta1"], s))
        pi_c = G1H.add(pi_c, pih)
        pi_c = G1H.add(pi_c, G1H.mul(pi_a, s))
        pi_c = G1H.add(pi_c, G1H.mul(pib1, r))
        pi_c = G1H.add(pi_c, G1H.neg(G1H.mul(vk["delta1"], rs)))

        self.last_phases["host"] = time.perf_counter() - t1
        self.last_phases["total"] = time.perf_counter() - t0

        proof = Proof(a=G1H.to_affine(pi_a), b=G2H.to_affine(pi_b),
                      c=G1H.to_affine(pi_c))
        publics = [_words_int(wit[i]) for i in range(1, self.n_public + 1)]
        return proof, publics


# ---------------------------------------------------------------------------
# host-side helpers
# ---------------------------------------------------------------------------

def _words_int(row) -> int:
    return sum(int(v) << (32 * i) for i, v in enumerate(np.asarray(row)))


def _ref_g1_from_limbs(limbs):
    """(2, 16) Montgomery affine limbs -> ref affine int point / None."""
    from .ref.field import FQ_CTX
    from .utils.limbs import limbs_to_ints
    xi, yi = (FQ_CTX.from_mont(v) for v in limbs_to_ints(limbs))
    return None if xi == 0 and yi == 0 else (xi, yi)


def _ref_g2_from_limbs(limbs):
    from .ref.field import FQ_CTX
    from .utils.limbs import limbs_to_ints
    x0, x1, y0, y1 = (FQ_CTX.from_mont(v) for v in limbs_to_ints(limbs))
    if x0 == x1 == y0 == y1 == 0:
        return None
    return ((x0, x1), (y0, y1))


