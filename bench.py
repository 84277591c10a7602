"""Benchmark harness: the BASELINE.md ladder as machine-readable JSON.

Emits ONE JSON line per metric. Ordering policy (BENCH_r02's rc=124
lesson + BENCH_r03's starved-2^24 lesson): ONE quick rung first (the
smallest fixture lands a parseable line within ~2 minutes), then the
LARGEST fixture immediately — the headline size gets the whole
remaining budget instead of running last and being starved by the
intermediate rungs — then the remaining sizes backfill DESCENDING,
each budget-gated. Kernel metrics (MSM points/s, NTT butterflies/s)
follow only if the self-imposed wall-clock budget still has room. The
final line repeats the headline (largest successful prove) — the
driver parses the last line.

vs_baseline is measured against DOCUMENTED STAND-INS (the reference
publishes no numbers — BASELINE.md "Stand-in derivation" section pins
how 10M G1 pts/s and 0.4 s @2^16 were derived). Treat the ratios as
estimates (extra.baseline = "stand-in-estimate").

roofline_pct anchors kernel numbers to HARDWARE instead: the measured
rate as a percentage of the v5e VPU elementwise ceiling for this
formulation's arithmetic (derivation in _roofline_pts_per_sec below and
PERF.md "measured machine limits").

Env knobs: RSTPU_BENCH_BUDGET_S (wall budget, default 2800),
RSTPU_BENCH_LOGN (kernel MSM/NTT size, default 20), RSTPU_BENCH_REPS
(default 2), RSTPU_BENCH_WINDOW (Pippenger c, default auto),
RSTPU_BENCH_PROVE=0 (skip proves), RSTPU_BENCH_MAX_LOGN (skip fixtures
above this, default 24), RSTPU_BENCH_KERNELS=0 (skip kernel metrics).
"""

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rapidsnark_tpu.utils import cache  # noqa: E402

cache.enable()

_T0 = time.monotonic()
_HEAD = None  # best headline line emitted so far (crash-safe re-emit)
BUDGET_S = float(os.environ.get("RSTPU_BENCH_BUDGET_S", "2800"))

BASELINE_G1_MSM_PTS_PER_SEC = 1.0e7   # 64-core rapidsnark-class stand-in
BASELINE_PROVE_S_2_16 = 0.4           # same box, 2^16 prove, linear scale
# (derivations pinned in BASELINE.md "Stand-in derivation")

# v5e VPU elementwise ceiling (8x128 lanes @ 940 MHz, PERF.md): the
# denominator of roofline_pct.
VPU_ELEMOPS_PER_SEC = 960e9
# elem-ops per fused mixed add (one lane), counted from the kernel
# formulas: G1 = 11 Fq mont_muls (~2.1k elem-ops each: 16 CIOS steps x
# ~130 ops) + ~1.5k add/sub/select overhead; G2 = Karatsuba Fq2 -> 33
# base muls + Fq2 overhead. Measured kernels reach 70-85% of the
# implied ceiling, so these constants are honest to ~15%.
ELEMOPS_PER_ADD = {"g1": 25_000, "g2": 74_000}


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


_LAST = None  # last emitted line (fallback re-emit when no headline)


def _emit(metric, value, unit, vs_baseline, **extra):
    global _LAST
    line = {"metric": metric, "value": value, "unit": unit,
            "vs_baseline": vs_baseline, "extra": extra}
    print(json.dumps(line), flush=True)
    _LAST = line
    return line


def _roofline_pts_per_sec(curve: str, nwin: int) -> float:
    """Speed-of-light MSM rate for the sort+scan formulation: every
    point pays `nwin` fused mixed adds (one per window pass); sort,
    gather and bucket extraction are treated as free. points/s ceiling
    = VPU elem-ops/s / (nwin * elemops_per_add)."""
    return VPU_ELEMOPS_PER_SEC / (nwin * ELEMOPS_PER_ADD[curve])


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


def _make_points_g2(n: int):
    import numpy as np
    from rapidsnark_tpu.ref import curve as refc
    from rapidsnark_tpu.utils import points as PT

    base = []
    p = refc.G2_GEN
    for _ in range(min(64, n)):
        base.append(p)
        p = refc.G2.add(p, refc.G2_GEN)
    arr = np.stack([PT.g2_affine_to_mont_limbs(q) for q in base])
    reps = -(-n // arr.shape[0])
    return np.tile(arr, (reps, 1, 1))[:n]


def _scalars(n: int, seed: int = 7):
    import numpy as np
    from rapidsnark_tpu.ops import msm as M

    rng = np.random.RandomState(seed)
    limbs = rng.randint(0, 1 << 16, size=(n, 16)).astype(np.uint32)
    limbs[:, 15] &= 0x3FFF  # Fr-sized scalars (< 2^254), as in proving
    return M.pad_scalars(limbs, M.pad_len(n))


def _materialize(out):
    # on tunneled backends block_until_ready can return before execution
    # finishes; a host fetch is the ground truth
    import numpy as np
    import jax
    return [np.asarray(leaf) for leaf in jax.tree.leaves(out)]


def bench_msm(curve_name: str, log_n: int, reps: int, c):
    from rapidsnark_tpu.ops import msm as M

    n = 1 << log_n
    if curve_name == "g1":
        pts = M.prepare_g1(_make_points(n))
        fn = M.msm_g1
    else:
        pts = M.prepare_g2(_make_points_g2(n))
        fn = M.msm_g2
    scalars = _scalars(n)
    c = c or M.best_window_bits(n)

    def run():
        return _materialize(fn(pts, scalars, c))

    run()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    # roofline accounting: under GLV every ORIGINAL point pays
    # 2 entries x ceil(128/c) windows of scan adds
    from rapidsnark_tpu.ops import glv as GLV
    if GLV.enabled():
        nwin = 2 * M.n_windows(c, GLV.GLV_BITS)
    else:
        nwin = M.n_windows(c)
    return n / dt, dt, c, nwin


def bench_ntt(log_n: int, reps: int):
    """The prover's coset pipeline on a 3-poly batch (to_odd_coset:
    gather-free DIF stages -> fused shift mul -> DIT stages, i.e. one
    inverse + one forward transform): butterflies/s =
    3 polys * 2 transforms * (N/2 * log2 N) / dt. Note the plain ntt()
    entry pays a bit-reversal lane gather the production path avoids —
    benching it would measure the gather, not the butterflies."""
    import numpy as np
    import jax.numpy as jnp
    from rapidsnark_tpu.ops.ntt import NTTPlan, to_odd_coset

    n = 1 << log_n
    plan = NTTPlan(log_n)
    arrays = {k: jnp.asarray(v) for k, v in plan.arrays().items()}
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randint(0, 1 << 16, size=(16, 3, n),
                                dtype=np.uint32))

    import jax

    # fetch a small output slice: it blocks on the whole transform
    # finishing but moves KBs, not the full (16,3,N) tensor — on the
    # tunneled backend a 192 MB fetch costs ~25 s and would dominate.
    # Twiddles ride as jit ARGUMENTS (a closure would bake them as
    # ~128 MB of HLO constants and blow the remote-compile request).
    fn = jax.jit(lambda v, t: to_odd_coset(v, t, plan.eta)[:, :, :128])

    def run():
        return np.asarray(fn(x, arrays))

    run()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return 3 * 2 * (n // 2) * log_n / dt, dt


def bench_prove(path: str):
    """(warm_latency_s, phases) for one fixture; None if absent.

    The Prover is release()d before returning — its jit caches hold the
    instance alive (static self), so without the explicit drop every
    rung's multi-GB tables would stay pinned in HBM for the rest of the
    run (the round-4 OOM that killed BENCH_r04)."""
    from rapidsnark_tpu.io.wtns import read_wtns
    from rapidsnark_tpu.io.zkey import read_zkey
    from rapidsnark_tpu.prover import Prover

    zkey = read_zkey(path + ".zkey")
    prover = Prover(zkey)
    zkey.close()
    try:
        wit = read_wtns(path + ".wtns").values
        prover.prove(wit)                         # compile + warm
        t0 = time.perf_counter()
        prover.prove(wit)
        return time.perf_counter() - t0, dict(prover.last_phases)
    finally:
        prover.release()


# first-visit cost (compile + table upload via the ~40 MB/s tunnel + 2
# proves) per fixture size; calibrated round 3 on v5e: 2^22 measured
# 632 s, 2^16 ~60 s. Used to decide whether the remaining budget can
# still fit the NEXT size; an overrun on the current size is sunk.
def _prove_cost_estimate_s(log_n: int) -> float:
    # subprocess rungs pay construction (zkey read + repack + upload)
    # every time: ~2.5e-4 s/constraint measured round 5 (2^24 child
    # ~850 s warm: ~500 construction + 2 proves)
    return 60.0 + 2.5e-4 * (1 << log_n)


def _child_emit_rung(ln: int, fixdir: str, plat: str):
    """--rung child mode: ONE fixture rung, one JSON line, exit."""
    path = os.path.join(fixdir, f"sqchain{1 << ln}")
    prove_s, phases = bench_prove(path)
    baseline_s = BASELINE_PROVE_S_2_16 * (1 << ln) / (1 << 16)
    _emit(f"groth16_prove_latency_2^{ln}", round(prove_s, 3), "s",
          round(baseline_s / prove_s, 4), platform=plat,
          prove_latency_s=round(prove_s, 3),
          phases={k: round(v, 3) for k, v in phases.items()},
          baseline="stand-in-estimate")


def _run_rung_subprocess(ln: int, budget_s: float):
    """Run one fixture rung in a CHILD process (the disk compile cache
    keeps it warm): a rung that RESOURCE_EXHAUSTs poisons its backend
    session — in BENCH_r05's dry run one OOM turned every later
    metric into a failure. Isolation costs ~20 s of process startup.
    Returns (parsed line dict | None, error | None)."""
    import subprocess
    cmd = [sys.executable, os.path.abspath(__file__), "--rung", str(ln)]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=max(budget_s, 60))
    except subprocess.TimeoutExpired:
        return None, f"subprocess timeout ({budget_s:.0f}s)"
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
            if d.get("metric", "").startswith("groth16_prove_latency"):
                return d, None
        except ValueError:
            continue
    tail = (out.stderr or out.stdout or "").strip().splitlines()
    return None, (tail[-1][-300:] if tail else f"rc={out.returncode}")


def main():
    log_n = int(os.environ.get("RSTPU_BENCH_LOGN", "20"))
    reps = int(os.environ.get("RSTPU_BENCH_REPS", "2"))
    max_logn = int(os.environ.get("RSTPU_BENCH_MAX_LOGN", "24"))
    c_env = os.environ.get("RSTPU_BENCH_WINDOW")
    c = int(c_env) if c_env else None

    import jax
    plat = jax.devices()[0].platform

    global _HEAD
    head, head_ln = None, -1

    # --- end-to-end prove ladder: quick size, then LARGEST first ----------
    if os.environ.get("RSTPU_BENCH_PROVE", "1") != "0":
        fixdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_fixtures")
        sizes = []
        for f in glob.glob(os.path.join(fixdir, "sqchain*.zkey")):
            m = re.match(r"sqchain(\d+)$",
                         os.path.basename(f)[:-len(".zkey")])
            if m:
                n = int(m.group(1))
                if n.bit_length() - 1 <= max_logn:
                    sizes.append(n.bit_length() - 1)
        # order (BENCH_r03's lesson — ascending starved the headline;
        # r4's lesson — backfill starved the kernel lines): smallest
        # first (a line lands within ~2 min), the LARGEST second (the
        # headline gets the budget while it is plentiful), THEN the
        # kernel metrics, then the rest DESCENDING as gated backfill.
        asc = sorted(sizes)
        order = asc[:1]
        if len(asc) > 1:
            order += [asc[-1]]
        backfill = asc[-2:0:-1]

        subproc = os.environ.get("RSTPU_BENCH_SUBPROC", "1") != "0"

        def prove_rung(ln, gated):
            nonlocal head, head_ln
            global _HEAD
            if gated and _remaining() < _prove_cost_estimate_s(ln):
                _emit(f"groth16_prove_SKIPPED_2^{ln}", None, "s", None,
                      reason=f"budget: {_remaining():.0f}s left")
                return
            if subproc:
                line, err = _run_rung_subprocess(
                    ln, _remaining() if gated
                    else max(_remaining(), _prove_cost_estimate_s(ln)))
                if line is None:
                    _emit(f"groth16_prove_FAILED_2^{ln}", None, "s",
                          None, error=str(err)[:300])
                    return
                print(json.dumps(line), flush=True)
            else:
                path = os.path.join(fixdir, f"sqchain{1 << ln}")
                try:
                    prove_s, phases = bench_prove(path)
                except Exception as e:  # OOM etc: keep the rest going
                    _emit(f"groth16_prove_FAILED_2^{ln}", None, "s",
                          None, error=str(e)[:300])
                    return
                baseline_s = BASELINE_PROVE_S_2_16 * (1 << ln) / (1 << 16)
                line = _emit(
                    f"groth16_prove_latency_2^{ln}", round(prove_s, 3),
                    "s", round(baseline_s / prove_s, 4), platform=plat,
                    prove_latency_s=round(prove_s, 3),
                    phases={k: round(v, 3) for k, v in phases.items()},
                    baseline="stand-in-estimate")
            if head is None or ln > head_ln:
                head, head_ln = line, ln  # largest size that ran
                _HEAD = head

        for ln in order:
            # the quick and headline rungs run ungated — a slow
            # headline line beats a SKIPPED one
            prove_rung(ln, gated=False)

    # --- MSM / NTT kernel metrics (budget-gated, each CRASH-PROOF:
    # a kernel-stage OOM killed the whole of BENCH_r04) ---------------------
    if os.environ.get("RSTPU_BENCH_KERNELS", "1") != "0":
        msm_ln = min(log_n, max_logn)
        if _remaining() > 180:
            try:
                pts_per_sec, dt, c_used, nwin = bench_msm(
                    "g1", msm_ln, reps, c)
                roof = _roofline_pts_per_sec("g1", nwin)
                line = _emit(
                    f"g1_msm_points_per_sec_2^{msm_ln}",
                    round(pts_per_sec, 1), "points/s",
                    round(pts_per_sec / BASELINE_G1_MSM_PTS_PER_SEC, 4),
                    platform=plat, latency_s=round(dt, 4),
                    window_bits=c_used, windows=nwin,
                    roofline_pct=round(100 * pts_per_sec / roof, 1),
                    baseline="stand-in-estimate")
                if head is None:
                    head = line
                    _HEAD = head
            except Exception as e:
                _emit("g1_msm_FAILED", None, "points/s", None,
                      error=str(e)[:300])
        if _remaining() > 180:
            try:
                g2_ln = min(msm_ln, 18)  # synthetic G2 table build is
                pts2, dt2, c2, nwin2 = bench_msm("g2", g2_ln, reps, c)
                roof2 = _roofline_pts_per_sec("g2", nwin2)
                _emit(f"g2_msm_points_per_sec_2^{g2_ln}", round(pts2, 1),
                      "points/s",
                      round(3 * pts2 / BASELINE_G1_MSM_PTS_PER_SEC, 4),
                      platform=plat, latency_s=round(dt2, 4),
                      window_bits=c2, windows=nwin2,
                      roofline_pct=round(100 * pts2 / roof2, 1),
                      baseline="stand-in-estimate; vs_baseline scales G2 "
                               "adds ~3x G1")
            except Exception as e:
                _emit("g2_msm_FAILED", None, "points/s", None,
                      error=str(e)[:300])
        if _remaining() > 120:
            try:
                # 2^22 exercises the fused multi-stage pass pipeline at
                # the size PERF.md's round-4 claim was measured at
                ntt_ln = min(log_n + 2, 22)
                bf, dtn = bench_ntt(ntt_ln, reps)
                _emit(f"ntt_butterflies_per_sec_2^{ntt_ln}",
                      round(bf, 1), "butterflies/s", None,
                      platform=plat, latency_s=round(dtn, 4))
            except Exception as e:
                _emit("ntt_FAILED", None, "butterflies/s", None,
                      error=str(e)[:300])

    # --- backfill prove rungs (descending, budget-gated) — AFTER the
    # kernel metrics so a long 2^24 rung cannot starve the kernel lines
    # (VERDICT r4 #4) ------------------------------------------------------
    if os.environ.get("RSTPU_BENCH_PROVE", "1") != "0":
        for ln in backfill:
            prove_rung(ln, gated=True)

    return head


def _child_main():
    import jax
    plat = jax.devices()[0].platform
    fixdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_fixtures")
    ln = int(sys.argv[sys.argv.index("--rung") + 1])
    _child_emit_rung(ln, fixdir, plat)


if __name__ == "__main__":
    # the LAST stdout line must ALWAYS be parseable JSON (the driver
    # parses it): re-emit the headline from a finally, and turn any
    # escaped exception into a metric line after its traceback
    if "--rung" in sys.argv:
        # child mode: one rung, one JSON line; exceptions print to
        # stderr and exit nonzero (the parent reports the failure)
        _child_main()
        sys.exit(0)
    rc = 0
    try:
        main()
    except BaseException as e:
        import traceback
        traceback.print_exc()
        _emit("bench_CRASHED", None, "", None,
              error=f"{type(e).__name__}: {str(e)[:300]}")
        rc = 1
    finally:
        tail = _HEAD or _LAST
        if tail is None:
            tail = _emit("bench_no_metrics", None, "", None)
        else:
            print(json.dumps(tail), flush=True)
    sys.exit(rc)
