"""Microbenchmark: point-table gather formulations on the MSM hot path.

The MSM sort+scan design gathers the whole point table once per window
by a data-dependent permutation (ops/msm.py:_gather_last). Measures
candidate formulations with a K-step in-jit loop (per-step perturbation
of the permutation defeats CSE) so tunnel fetch latency amortizes:

  lane       — current production: (8, n) leaves, advanced-index gather
               on the trailing (lane) axis, x2 coordinates.
  row16      — row-major (n, 16) x||y table: 64-byte contiguous rows,
               one take, THEN transpose to (16, n).
  row16_noT  — the take alone (is the transpose or the gather the cost?)
  transpose  — the (n, 16) -> (16, n) transpose alone.

Usage: python tools/bench_gather.py [logn] [reps] [K]
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


def timeit(f, args, reps):
    r = f(*args)
    np.asarray(jax.tree.leaves(r)[0])[:1]
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        np.asarray(jax.tree.leaves(r)[0])[:1]
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n = 1 << logn
    rng = np.random.RandomState(0)
    perm_np = rng.permutation(n).astype(np.int32)

    tbl_lane = jnp.asarray(rng.randint(0, 2**31, size=(8, n), dtype=np.int64
                                       ).astype(np.uint32))
    tbl_row16 = jnp.asarray(
        np.concatenate([np.asarray(tbl_lane).T] * 2, axis=1).copy())
    perm = jnp.asarray(perm_np)

    from rapidsnark_tpu.ops.msm import _gather_last

    def loop(body):
        @jax.jit
        def run(t, p):
            def step(i, carry):
                acc, p = carry
                g = body(t, (p + i) % n)
                return acc ^ g, p
            acc0 = body(t, p)
            acc, _ = jax.lax.fori_loop(1, K, step, (acc0, p))
            return acc[..., :1]
        return run

    cases = [
        ("lane  (8,n) adv-idx x2 ",
         loop(lambda t, p: _gather_last(t, p, 0)
              ^ _gather_last(t, (p + 1) % n, 0)), tbl_lane),
        ("row16 (n,16) take+T    ",
         loop(lambda t, p: jnp.take(t, p, axis=0).T), tbl_row16),
        ("row16 take only        ",
         loop(lambda t, p: jnp.take(t, p, axis=0)), tbl_row16),
        ("transpose only         ",
         loop(lambda t, p: (t + p[:, None].astype(jnp.uint32)).T),
         tbl_row16),
    ]
    gb = 16 * 4 * n / 1e9  # gathered payload GB per step (x+y packed)
    for name, f, tbl in cases:
        dt = timeit(f, (tbl, perm), reps) / K
        print(f"{name}: {dt*1e3:8.2f} ms/step  {gb/dt:8.2f} GB/s")


if __name__ == "__main__":
    main()
