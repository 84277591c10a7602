"""Benchmark harness: G1 MSM throughput + end-to-end prove latency.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric: G1 Pippenger MSM points/sec on one chip (BASELINE.json:
"MSM points/sec/chip" — MSMs dominate the reference's wall time,
SURVEY.md §3.1). The reference publishes no numbers (BASELINE.md), so
vs_baseline is measured against a documented stand-in: 10M G1
points/sec, the ballpark of rapidsnark-class CPU provers on a 64-core
host (≈1.6s for the 4 nVars-sized + 1 domain-sized G1 MSMs of a 2^22
proof).

Env knobs: RSTPU_BENCH_LOGN (default 16), RSTPU_BENCH_WINDOW (Pippenger
c, default auto), RSTPU_BENCH_REPS (default 3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rapidsnark_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()

BASELINE_G1_MSM_PTS_PER_SEC = 1.0e7  # 64-core rapidsnark-class stand-in


def _make_points(n: int):
    """n valid G1 points, cheaply: 256 distinct multiples of the
    generator, tiled. MSM runtime is branch-free / value-independent
    (ops/curve.py complete adder), so tiling does not change timing."""
    import numpy as np
    from rapidsnark_tpu.ref import curve as refc
    from rapidsnark_tpu.utils import points as PT

    base = []
    p = refc.G1_GEN
    for _ in range(min(256, n)):
        base.append(p)
        p = refc.G1.add(p, refc.G1_GEN)
    arr = np.stack([PT.g1_affine_to_mont_limbs(q) for q in base])
    reps = -(-n // arr.shape[0])
    return np.tile(arr, (reps, 1, 1))[:n]


def bench_msm(log_n: int, reps: int, c: int | None):
    import numpy as np
    import jax
    from rapidsnark_tpu.ops import msm as M

    n = 1 << log_n
    pts = M.prepare_g1(_make_points(n))
    rng = np.random.RandomState(7)
    limbs = rng.randint(0, 1 << 16, size=(n, 16)).astype(np.uint32)
    limbs[:, 15] &= 0x3FFF  # Fr-sized scalars (< 2^254), as in proving
    scalars = M.pad_scalars(limbs, M.pad_len(n))
    c = c or M.best_window_bits(n)

    import numpy as _np

    def run():
        out = M.msm_g1(pts, scalars, c)
        # materialize: on tunneled backends block_until_ready can return
        # before execution finishes; host fetch is the ground truth
        return [_np.asarray(leaf) for leaf in jax.tree.leaves(out)]

    run()                                     # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return n / dt, dt, c


def bench_prove(log_n: int):
    """Warm end-to-end prove latency on a generated sqchain fixture
    (tools/gen_big_fixture.py); None if the fixture is absent."""
    import numpy as np
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_fixtures", f"sqchain{1 << log_n}")
    if not os.path.exists(base + ".zkey"):
        return None
    from rapidsnark_tpu.io.wtns import read_wtns
    from rapidsnark_tpu.io.zkey import read_zkey
    from rapidsnark_tpu.prover import Prover

    prover = Prover(read_zkey(base + ".zkey"))
    wit = read_wtns(base + ".wtns").values
    prover.prove(wit)                         # compile + warm
    t0 = time.perf_counter()
    prover.prove(wit)
    return time.perf_counter() - t0


def main():
    log_n = int(os.environ.get("RSTPU_BENCH_LOGN", "16"))
    reps = int(os.environ.get("RSTPU_BENCH_REPS", "3"))
    c_env = os.environ.get("RSTPU_BENCH_WINDOW")
    c = int(c_env) if c_env else None

    import jax
    plat = jax.devices()[0].platform
    extra = {"platform": plat}

    prove_s = None
    if os.environ.get("RSTPU_BENCH_PROVE", "1") != "0":
        prove_s = bench_prove(log_n)
    if prove_s is not None:
        # headline metric (BASELINE.json): Groth16 proof latency.
        # Stand-in baseline: ~0.4s for a 2^16 circuit on 64-core
        # rapidsnark-class hardware (no numbers published, BASELINE.md).
        baseline_s = 0.4 * (1 << log_n) / (1 << 16)
        extra["prove_latency_s"] = round(prove_s, 3)
        result = {
            "metric": f"groth16_prove_latency_2^{log_n}",
            "value": round(prove_s, 3),
            "unit": "s",
            "vs_baseline": round(baseline_s / prove_s, 4),
            "extra": extra,
        }
        print(json.dumps(result))
        return

    pts_per_sec, dt, c_used = bench_msm(log_n, reps, c)
    extra.update({"latency_s": round(dt, 4), "window_bits": c_used})
    result = {
        "metric": f"g1_msm_points_per_sec_2^{log_n}",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_sec / BASELINE_G1_MSM_PTS_PER_SEC, 4),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
