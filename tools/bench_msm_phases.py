"""Measure the production MSM's internal phase split on real hardware.

Times jitted sub-pipelines that stop after each stage (digits+sort,
+gather, +scan, full window group), on the production shapes: G1 with
the 4-MSM batch axis, window group G, chunked prefix scan. Differences
between consecutive stages give the per-stage cost. One window group is
measured and scaled by the group count for a whole-MSM estimate.

Usage: python tools/bench_msm_phases.py [logn] [c] [G] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from rapidsnark_tpu.utils import cache  # noqa: E402

cache.enable()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed(fn, args, reps):
    f = jax.jit(fn)
    def fetch(out):
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf[(slice(None),) * (leaf.ndim - 1) + (slice(1),)])
    fetch(f(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(f(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    G = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    n = 1 << logn
    B = 4

    from rapidsnark_tpu.ops import msm as M
    from rapidsnark_tpu.ops.curve import G1P

    rng = np.random.RandomState(0)
    # synthetic but VALID-shaped packed tables; adder cost is
    # value-independent (complete formulas)
    pts = (jnp.asarray(rng.randint(0, 2**31, size=(8, B, n),
                                   dtype=np.int64).astype(np.uint32)),
           jnp.asarray(rng.randint(0, 2**31, size=(8, B, n),
                                   dtype=np.int64).astype(np.uint32)))
    limbs = rng.randint(0, 1 << 16, size=(B, n, 16)).astype(np.uint32)
    limbs[:, :, 15] &= 0x3FFF
    sc = np.stack([np.asarray(M.pad_scalars(limbs[b], n))
                   for b in range(B)])
    scalars = jnp.asarray(sc)
    nwin = -(-M.SCALAR_BITS // c)

    def digits_sort(pts, scalars):
        carries = M.signed_digit_carries(scalars, c)
        s9 = jnp.concatenate(
            [scalars, jnp.zeros((B, n, 1), jnp.uint32)], axis=-1)
        dg = M.group_signed_digits(s9, carries, 0, G, c)
        iota = jax.lax.broadcasted_iota(jnp.int32, dg.shape, dg.ndim - 1)
        return jax.lax.sort_key_val(dg, iota, dimension=-1)

    def plus_gather(pts, scalars):
        sd, perm = digits_sort(pts, scalars)
        spts = M._pt_map(pts, lambda a: M._gather_last(a, perm, a.ndim - 2))
        return sd, spts

    def plus_scan(pts, scalars):
        sd, spts = plus_gather(pts, scalars)
        sign = (sd & 1).astype(jnp.uint32)[None]
        within, excl = M._chunked_prefix(G1P, spts, sign, sd.shape[:-1], n)
        return within[0], excl[0]

    def full_group(pts, scalars):
        carries = M.signed_digit_carries(scalars, c)
        s9 = jnp.concatenate(
            [scalars, jnp.zeros((B, n, 1), jnp.uint32)], axis=-1)
        dg = M.group_signed_digits(s9, carries, 0, G, c)
        return M._window_group(G1P, pts, dg, n, c)

    t_ds = timed(digits_sort, (pts, scalars), reps)
    t_g = timed(plus_gather, (pts, scalars), reps)
    t_s = timed(plus_scan, (pts, scalars), reps)
    t_f = timed(full_group, (pts, scalars), reps)

    ngroups = nwin // G
    print(f"n=2^{logn} c={c} G={G} B={B}  ({ngroups} groups/MSM)")
    print(f"  digits+sort : {t_ds*1e3:8.1f} ms/group")
    print(f"  gather      : {(t_g-t_ds)*1e3:8.1f} ms/group"
          f"   ({2*8*4*G*B*n/ (t_g-t_ds)/1e9:6.2f} GB/s)")
    print(f"  prefix scan : {(t_s-t_g)*1e3:8.1f} ms/group")
    print(f"  extraction  : {(t_f-t_s)*1e3:8.1f} ms/group")
    print(f"  full group  : {t_f*1e3:8.1f} ms/group "
          f"-> whole MSM ~ {t_f*ngroups:6.2f} s")


if __name__ == "__main__":
    main()
