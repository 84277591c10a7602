#!/usr/bin/env python3
"""Round-4 TPU experiment batch (dev tool, run on a free chip).

Measures the levers the round-3 verdict ranked: window-size sweep at
production sizes (c=13 was tuned pre-GLV at 2^18-2^20; the model says
larger c wins once the n-term dominates extraction), NTT coset-pipeline
throughput with the fused-pass path, and the msm phase ablation.

Usage: python tools/exp_r4.py [which ...]
  which in {sweep, sweep22, ntt, ablate}; default: all.
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


def _timeit(fn, *args, reps=2):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(np.asarray, out)
        times.append(time.perf_counter() - t0)
    return min(times)


def sweep(logn: int, cs=(13, 14, 15, 16)):
    from bench import _make_points, _scalars
    from rapidsnark_tpu.ops import msm as M

    n = 1 << logn
    pts = M.prepare_g1(_make_points(n))
    scalars = _scalars(n)
    print(f"== G1 window sweep @2^{logn} ==", flush=True)
    for c in cs:
        t0 = time.time()
        dt = _timeit(functools.partial(M.msm_g1, c=c), pts, scalars)
        print(f"c={c:2d}: {dt*1e3:9.1f} ms  {n/dt/1e6:6.3f} M pts/s "
              f"(compile+2 reps {time.time()-t0:.0f}s)", flush=True)


def ntt_t(logn: int):
    from bench import bench_ntt
    bf, dt = bench_ntt(logn, 2)
    print(f"== NTT coset 3-batch @2^{logn}: {dt*1e3:.1f} ms  "
          f"{bf/1e6:.1f} M butterflies/s ==", flush=True)


def main():
    which = set(sys.argv[1:]) or {"ablate", "sweep", "ntt", "sweep22"}
    print("backend:", jax.default_backend(), flush=True)
    if "ablate" in which:
        import subprocess
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     "msm_ablate.py"), "20", "2"])
    if "sweep" in which:
        sweep(20)
    if "ntt" in which:
        ntt_t(20)
        ntt_t(22)
    if "sweep22" in which:
        sweep(22, cs=(13, 16))


if __name__ == "__main__":
    main()
