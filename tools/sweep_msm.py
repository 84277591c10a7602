#!/usr/bin/env python3
"""Window-size / schedule sweep for the MSM kernels on real hardware.

Usage: python tools/sweep_msm.py [g1|g2|both] [log_n] [c,c,c...]
Prints one line per config: curve, c, windows, latency, points/s.
Reuses bench.py's table/scalar builders so numbers are comparable.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from rapidsnark_tpu.utils import cache  # noqa: E402

cache.enable()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    cs = ([int(c) for c in sys.argv[3].split(",")]
          if len(sys.argv) > 3 else [13, 14, 15, 16])
    reps = int(os.environ.get("RSTPU_SWEEP_REPS", "2"))

    import bench
    from rapidsnark_tpu.ops import msm as M

    for curve in (["g1", "g2"] if which == "both" else [which]):
        for c in cs:
            pps, dt, c_used, nwin = bench.bench_msm(curve, log_n, reps, c)
            print(f"{curve} 2^{log_n} c={c_used} W={nwin}: "
                  f"{dt:.4f}s  {pps:,.0f} pts/s", flush=True)


if __name__ == "__main__":
    main()
