#!/usr/bin/env python3
"""MSM phase ablation + gather-layout microbench (dev tool).

Times truncated variants of the ops/msm.py pipeline so the sort /
gather / scan / extraction split is measured, not inferred, and
compares candidate gather layouts for the sort permutation (the
round-3 verdict: sort+gather ~35% of MSM; execution at 43.6% of the
formulation roofline).

Usage: python tools/msm_ablate.py [logn] [reps]
All variants are value-independent (branch-free kernels), so checksums
only force materialization.
"""

import functools
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


def _timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(np.asarray, out)
        times.append(time.perf_counter() - t0)
    return min(times)


def _chk(x):
    """Tiny slice to force execution without a huge fetch."""
    return jax.tree.map(lambda a: a.reshape(-1)[:8], x)


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n = 1 << logn

    from bench import _make_points, _scalars
    from rapidsnark_tpu.ops import msm as M
    from rapidsnark_tpu.ops import glv as GLV
    from rapidsnark_tpu.ops.curve import G1P

    pts = M.prepare_g1(_make_points(n))
    scalars = _scalars(n)
    c = M.best_window_bits(n)
    Gw = 5
    params = GLV.params_for(G1P)

    print(f"n=2^{logn} c={c} glv={GLV.enabled()} "
          f"backend={jax.default_backend()}", flush=True)

    t_full = _timeit(functools.partial(M.msm_g1, c=c), pts, scalars,
                     reps=reps)
    print(f"full msm_g1      : {t_full*1e3:9.1f} ms   "
          f"{n/t_full/1e6:6.3f} M pts/s", flush=True)

    # --- pieces (GLV path mirror of msm()) --------------------------------
    bits = GLV.GLV_BITS
    nwin = -(-bits // c)
    G_ = min(Gw, nwin)
    while nwin % G_:
        G_ -= 1
    ngroups = nwin // G_

    @jax.jit
    def digits_only(scalars):
        sc, neg = GLV.decompose(params, scalars)
        carries = M.signed_digit_carries(sc, c, bits, lead=True)
        s9 = sc  # decompose pads the zero word row

        def step(_, ig):
            dg = M.group_signed_digits(s9, carries, ig * G_, G_, c,
                                       lead=True)
            dg = dg ^ neg[None].astype(dg.dtype)
            return None, dg.sum(dtype=jnp.int32)

        _, out = jax.lax.scan(step, None,
                              jnp.arange(ngroups, dtype=jnp.int32))
        return out

    t_dig = _timeit(digits_only, scalars, reps=reps)
    print(f"decomp+digits    : {t_dig*1e3:9.1f} ms", flush=True)

    def _digit_groups(scalars):
        sc, neg = GLV.decompose(params, scalars)
        carries = M.signed_digit_carries(sc, c, bits, lead=True)
        return sc, carries, neg

    @jax.jit
    def sort_only(scalars):
        s9, carries, neg = _digit_groups(scalars)

        def step(_, ig):
            dg = M.group_signed_digits(s9, carries, ig * G_, G_, c,
                                       lead=True)
            dg = dg ^ neg[None].astype(dg.dtype)
            iota = jax.lax.broadcasted_iota(jnp.int32, dg.shape,
                                            dg.ndim - 1)
            sd, perm = jax.lax.sort_key_val(dg, iota, dimension=-1)
            return None, (sd.sum(dtype=jnp.int32),
                          perm.sum(dtype=jnp.int32))

        _, out = jax.lax.scan(step, None,
                              jnp.arange(ngroups, dtype=jnp.int32))
        return out

    t_sort = _timeit(sort_only, scalars, reps=reps)
    print(f"  + sort         : {t_sort*1e3:9.1f} ms   "
          f"(sort ~ {(t_sort-t_dig)*1e3:.1f})", flush=True)

    @jax.jit
    def sort_gather(scalars, pts):
        s9, carries, neg = _digit_groups(scalars)
        p2 = M._phi_extend(G1P, pts)

        def step(_, ig):
            dg = M.group_signed_digits(s9, carries, ig * G_, G_, c,
                                       lead=True)
            dg = dg ^ neg[None].astype(dg.dtype)
            iota = jax.lax.broadcasted_iota(jnp.int32, dg.shape,
                                            dg.ndim - 1)
            sd, perm = jax.lax.sort_key_val(dg, iota, dimension=-1)
            spts = M._pt_map(p2, lambda a: M._gather_last(
                a, perm, a.ndim - 2))
            return None, (jax.tree.map(
                lambda a: a.sum(dtype=jnp.uint32), spts),
                sd.sum(dtype=jnp.int32))

        _, out = jax.lax.scan(step, None,
                              jnp.arange(ngroups, dtype=jnp.int32))
        return out

    t_sg = _timeit(sort_gather, scalars, pts, reps=reps)
    print(f"  + gather       : {t_sg*1e3:9.1f} ms   "
          f"(gather ~ {(t_sg-t_sort)*1e3:.1f})", flush=True)

    @jax.jit
    def no_sort_scan(scalars, pts):
        """Full pipeline minus sort+gather: identity order (same
        arithmetic cost — kernels are value-independent)."""
        s9, carries, neg = _digit_groups(scalars)
        p2 = M._phi_extend(G1P, pts)
        n2 = jax.tree.leaves(p2)[0].shape[-1]

        def step(_, ig):
            dg = M.group_signed_digits(s9, carries, ig * G_, G_, c,
                                       lead=True)
            dg = dg ^ neg[None].astype(dg.dtype)
            sorted_digits = dg  # pretend sorted
            spts = M._pt_map(p2, lambda a: jnp.broadcast_to(
                a[:, None], a.shape[:1] + (G_,) + a.shape[1:]))
            sign = (sorted_digits & 1).astype(jnp.uint32)[None]
            within, excl = M._chunked_prefix(G1P, spts, sign, (G_,), n2)
            Mb = 1 << (c - 1)
            queries = 2 * jnp.arange(Mb + 1, dtype=jnp.int32) + 1
            cum = jax.vmap(lambda d: jnp.searchsorted(
                d, queries, side="right"))(
                    sorted_digits.reshape(-1, n2)).reshape((G_, Mb + 1))
            A = M._ps_at(G1P, within, excl, cum.astype(jnp.int32))
            top = M._pt_map(A, lambda a: jnp.broadcast_to(
                a[..., Mb:], a.shape[:-1] + (Mb,)))
            head = M._pt_map(A, lambda a: a[..., :Mb])
            diff = M._add(G1P, top, G1P.neg(head))
            return None, M._tree_total(G1P, diff, Mb)

        _, out = jax.lax.scan(step, None,
                              jnp.arange(ngroups, dtype=jnp.int32))
        return _chk(out)

    t_nss = _timeit(no_sort_scan, scalars, pts, reps=reps)
    print(f"scan+extract     : {t_nss*1e3:9.1f} ms   "
          f"(digits+scan+extract, no sort/gather)", flush=True)
    print(f"  sum of parts   : {(t_sg + t_nss - t_dig)*1e3:9.1f} ms "
          f"vs full {t_full*1e3:.1f}", flush=True)

    # --- gather layout microbench ------------------------------------------
    print("\n-- gather layouts (one window group: G=%d perms of 2n) --"
          % G_, flush=True)
    n2 = 2 * n
    rng = np.random.RandomState(5)
    perm_np = np.stack([rng.permutation(n2).astype(np.int32)
                        for _ in range(G_)])
    perm = jnp.asarray(perm_np)                      # (G, n2)
    x8, y8 = (jnp.concatenate([a, a], axis=-1) for a in pts)  # (8, n2)
    rowmaj = jnp.asarray(
        np.concatenate([np.asarray(x8).T, np.asarray(y8).T],
                       axis=1))                      # (n2, 16)

    @jax.jit
    def g_minor(x8, y8, perm):
        out = [M._gather_last(a, perm, 0) for a in (x8, y8)]
        return [a.sum(dtype=jnp.uint32) for a in out]

    @jax.jit
    def g_rows(rowmaj, perm):
        out = rowmaj[perm]                           # (G, n2, 16)
        return out.sum(dtype=jnp.uint32)

    @jax.jit
    def g_rows_T(rowmaj, perm):
        out = rowmaj[perm]                           # (G, n2, 16)
        t = jnp.moveaxis(out, -1, 0)                 # (16, G, n2)
        return t.sum(dtype=jnp.uint32)

    @jax.jit
    def g_sort_multi(x8, y8, keys):
        ops = [keys] + [jnp.broadcast_to(a[j][None], keys.shape)
                        for a in (x8, y8) for j in range(8)]
        out = jax.lax.sort(ops, dimension=-1, num_keys=1)
        return [a.sum(dtype=jnp.uint32) for a in out[1:]]

    t0 = _timeit(g_minor, x8, y8, perm, reps=reps)
    print(f"minor-axis gather (current): {t0*1e3:9.1f} ms   "
          f"{64*G_*n2/t0/2**30:6.1f} GiB/s", flush=True)
    t1 = _timeit(g_rows, rowmaj, perm, reps=reps)
    print(f"row-major row gather       : {t1*1e3:9.1f} ms   "
          f"{64*G_*n2/t1/2**30:6.1f} GiB/s", flush=True)
    t2 = _timeit(g_rows_T, rowmaj, perm, reps=reps)
    print(f"row gather + transpose     : {t2*1e3:9.1f} ms   "
          f"{64*G_*n2/t2/2**30:6.1f} GiB/s", flush=True)
    keys = jnp.asarray(rng.randint(0, 1 << (c - 1), (G_, n2), dtype=np.int32))
    t3 = _timeit(g_sort_multi, x8, y8, keys, reps=reps)
    print(f"17-operand sort            : {t3*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
