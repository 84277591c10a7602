"""Distributed NTT over a device mesh: the four-step (transpose)
algorithm with all-to-all exchanges.

The reference scales its FFT only via OpenMP threads inside one node
(ffiasm FFT<Fr>, SURVEY.md §2.12); this is the TPU replacement that
scales domainSize across chips (BASELINE.json configs 4-5: "distributed
NTT within one host", "all-to-all NTT stages" across hosts).

Math (N = N1*N2, input n = n1*N2 + n2, output k = k2*N1 + k1):
    X[k2*N1 + k1] = sum_{n2} w_N2^{n2 k2} * w_N^{n2 k1}
                    * sum_{n1} w_N1^{n1 k1} * a[n1*N2 + n2]
i.e. column FFTs (size N1), a diagonal twiddle w_N^{k1*n2}, row FFTs
(size N2). Each device holds a contiguous 1/D slice; three TILED
all-to-alls implement the (n1|n2) -> (n2|k1) -> (k1|k2) transposes so
every local FFT runs our fori-loop kernel (ops/ntt.py) at full width.
Input and output are both natural-order, sharded contiguously.

Communication: 3 transposes of N elements per transform vs N log2(N)
butterfly work — the all-to-alls ride ICI within a slice and DCN across
hosts, inserted by shard_map/XLA from the single collective primitive.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.ntt import NTTPlan, _powers_mont, ntt
from ..ops.field import FR
from ..ref.field import R_FR, fr_w

AXIS = "shard"


class DNTTPlan:
    """Tables for a distributed size-N transform: sub-plans for the
    column (N1) and row (N2) FFTs plus the w_N / w_N^-1 power tables for
    the diagonal twiddle. N1 is chosen >= N2 with D | N1 and D | N2."""

    def __init__(self, power: int, n_devices: int):
        self.power = power
        self.n = 1 << power
        p1 = (power + 1) // 2
        self.n1 = 1 << p1
        self.n2 = self.n // self.n1
        if self.n1 % n_devices or self.n2 % n_devices:
            raise ValueError(
                f"n_devices={n_devices} must divide both N1={self.n1} "
                f"and N2={self.n2}")
        self.n_devices = n_devices
        w = fr_w(power)
        self.col = NTTPlan(p1, with_coset=False)
        self.row = NTTPlan(power - p1, with_coset=False)
        self.tw_fwd = _powers_mont(w, self.n)                  # (16, N)
        self.tw_inv = _powers_mont(pow(w, -1, R_FR), self.n)
        # four-step sub-FFTs are unscaled; the inverse scales once by 1/N
        from ..utils.limbs import ints_to_limbs
        self.ninv = ints_to_limbs(
            [pow(self.n, -1, R_FR) * (1 << 256) % R_FR])[0]

    def arrays(self) -> Dict:
        sub = {}
        for name, plan in (("col", self.col), ("row", self.row)):
            for k, v in plan.arrays().items():
                sub[f"{name}_{k}"] = jnp.asarray(v)
        sub["tw_fwd"] = jnp.asarray(self.tw_fwd)
        sub["tw_inv"] = jnp.asarray(self.tw_inv)
        sub["ninv"] = jnp.asarray(self.ninv)
        return sub


def _sub_arrays(arrays: Dict, name: str) -> Dict:
    pre = name + "_"
    return {k[len(pre):]: v for k, v in arrays.items()
            if k.startswith(pre)}


def _local_body(x, arrays, n1: int, n2: int, inverse: bool):
    """Per-device four-step body. x: (16, *batch, Nlocal = N/D)."""
    d = jax.lax.axis_index(AXIS)
    nd = jax.lax.psum(1, AXIS)
    lead = x.shape[:-1]
    r1 = n1 // nd   # local rows (n1 slice)
    c2 = n2 // nd   # local cols (n2 slice)

    # local natural (16,*b, r1*n2) -> matrix (16,*b, r1, n2)
    x = x.reshape(lead + (r1, n2))
    # transpose #1: (n1-slice | all n2) -> (all n1 | n2-slice), laid out
    # n2-major for the column FFTs: split n2, concat on a NEW leading
    # device axis folded into n2... use tiled all_to_all:
    x = jax.lax.all_to_all(x, AXIS, split_axis=x.ndim - 1,
                           concat_axis=x.ndim - 2, tiled=True)
    # now (16,*b, n1, c2): column FFT over n1 -> put n1 last
    x = jnp.swapaxes(x, -1, -2)                    # (16,*b, c2, n1)
    x = ntt(x, _sub_arrays(arrays, "col"), inverse=inverse)

    # diagonal twiddle w_N^(k1 * n2_global), n2_global = d*c2 + row
    k1 = jax.lax.broadcasted_iota(jnp.int32, (c2, n1), 1)
    n2g = jax.lax.broadcasted_iota(jnp.int32, (c2, n1), 0) + d * c2
    tw_table = arrays["tw_inv"] if inverse else arrays["tw_fwd"]
    idx = (k1 * n2g) % (n1 * n2)   # k1*n2 < N: no int32 overflow
    tw = tw_table[:, idx]                           # (16, c2, n1)
    tw = jnp.broadcast_to(
        tw.reshape((16,) + (1,) * (len(lead) - 1) + (c2, n1)),
        lead + (c2, n1))
    x = FR.mul(x, tw)

    # transpose #2: (n2-slice | all k1) -> (all n2 | k1-slice)
    x = jax.lax.all_to_all(x, AXIS, split_axis=x.ndim - 1,
                           concat_axis=x.ndim - 2, tiled=True)
    # now (16,*b, n2, r1): row FFT over n2 -> put n2 last
    x = jnp.swapaxes(x, -1, -2)                    # (16,*b, r1, n2)
    x = ntt(x, _sub_arrays(arrays, "row"), inverse=inverse)

    # transpose #3 to natural contiguous output: k = k2*n1 + k1,
    # device d' owns k2 in [d'*c2, ...): (k1-slice | all k2) ->
    # (all k1 | k2-slice), then local transpose to k2-major
    x = jax.lax.all_to_all(x, AXIS, split_axis=x.ndim - 1,
                           concat_axis=x.ndim - 2, tiled=True)
    # now (16,*b, n1, c2) holding [k1][k2-slice]
    x = jnp.swapaxes(x, -1, -2)                    # (16,*b, c2, n1)
    x = x.reshape(lead + (c2 * n1,))
    if inverse:
        # sub-FFT inverses already applied 1/N1 and 1/N2 -> total 1/N;
        # nothing more to scale (ninv kept in the plan for callers that
        # run unscaled sub-FFTs).
        pass
    return x


def dntt(x, arrays, plan: DNTTPlan, mesh, inverse: bool = False):
    """Distributed DFT/iDFT. x: (16, *batch, N) natural order, sharded
    (or shardable) on the last axis; returns the same layout."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    ndim = x.ndim
    spec = P(*([None] * (ndim - 1) + [AXIS]))

    def body(xl, arr):
        return _local_body(xl, arr, plan.n1, plan.n2, inverse)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec, P()),
                   out_specs=spec, check_rep=False)
    return fn(x, arrays)
