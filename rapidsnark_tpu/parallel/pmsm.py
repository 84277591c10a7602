"""Sharded Pippenger MSM over a device mesh.

TPU-native replacement for the scaling the reference gets from OpenMP
threads inside ffiasm's multiMulByScalar (SURVEY.md §2.12, §5.7): the
point/scalar arrays shard along n across the mesh's "shard" axis, every
device runs the full local sort+scan MSM (ops/msm.py) on its n/D slice,
and the D partial Jacobian results combine with one all_gather of D
points plus a log2(D) running-sum pass of the complete adder — group
sums cannot ride psum (EC addition is not element-wise), so the
collective moves points, not buckets.

Communication per MSM: D * |point| bytes (a few KB) — the bucket phase
never crosses devices. This is the design BASELINE.json's ">=75% MSM
scaling efficiency at 2 hosts" target assumes: compute scales 1/D,
collectives are O(D) constants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops import msm as MSM
from ..ops.curve import CurveOps
from ..ops.msm import _pt_map, _hillis_prefix

AXIS = "shard"


def point_spec(ndim: int) -> P:
    """PartitionSpec for point leaves (16, *batch, n): shard last axis."""
    return P(*([None] * (ndim - 1) + [AXIS]))


def scalar_spec(ndim: int) -> P:
    """PartitionSpec for scalars (*batch, n, 16): shard the n axis."""
    return P(*([None] * (ndim - 2) + [AXIS, None]))


def pad_len_sharded(n: int, n_devices: int) -> int:
    """Pad so every device's local slice is a whole number of scan
    chunks."""
    unit = MSM._CHUNK * n_devices
    return max(unit, -(-n // unit) * unit)


def msm_sharded(curve: CurveOps, pts, scalars, c: int, mesh,
                window_group: int = 4, combine: bool = True,
                segment: int = 0):
    """MSM with points/scalars sharded on n across mesh axis "shard".

    pts: AFFINE pytree, leaves (16, *batch, n); scalars (*batch, n, 16);
    n divisible by D * _CHUNK. Each device runs the local sort+scan MSM
    to per-window
    totals; the D partial window points combine with one all_gather +
    running-sum pass (window sums are plain group sums, so they add
    across shards). Returns replicated: the combined Jacobian point
    (batch (*batch,)), or with combine=False the per-window totals
    (leaves (16, W, *batch)) for the host-side Horner combine.
    """
    from jax.experimental.shard_map import shard_map

    ndim_pt = scalars.ndim  # == point leaf ndim for G1; G2 leaves equal too
    in_specs = (
        jax.tree.map(lambda _: point_spec(ndim_pt), pts),
        scalar_spec(scalars.ndim),
    )
    nd = mesh.shape[AXIS]

    def body(local_pts, local_sc):
        # `segment` slices each device's LOCAL bucket accumulation
        # (bounds the prefix-scan working set exactly as on one chip —
        # a 2^24 MSM over 8 devices still holds 2^21 local points)
        part = MSM.msm(curve, local_pts, local_sc, c, window_group,
                       combine=False, segment=segment)  # (16, W, *batch)
        # gather device partials on a new last axis and group-reduce
        gath = _pt_map(part,
                       lambda a: jnp.moveaxis(
                           jax.lax.all_gather(a, AXIS), 0, -1))
        total = _hillis_prefix(curve, gath, nd)
        wpts = _pt_map(total, lambda a: a[..., -1])
        if not combine:
            return wpts
        nwin = jax.tree.leaves(wpts)[0].shape[1]  # halved under GLV
        return MSM._combine_windows(curve, wpts, nwin, c)

    # output is a JACOBIAN point (3 coords) regardless of the affine
    # (2-coord) input structure
    out_specs = jax.tree.map(lambda _: P(), (pts[0], pts[0], pts[0]))
    fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_rep=False)
    return fn(pts, scalars)
