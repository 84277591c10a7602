#!/usr/bin/env python3
"""Pre-compile (and validate) the bench-ladder prove pipelines.

The reference is an AOT binary — it starts proving at mmap speed
(tasksfile.js:63-85: plain g++ builds, no JIT). The TPU-native analogue
of shipping compiled binaries is a WARM persistent XLA compilation
cache (utils/cache.py): this tool runs ONE prove per requested fixture
size so that every executable in the pipeline (front stages, MSM stage,
NTT passes) lands in <repo>/.jax_cache keyed by HLO fingerprint. A
subsequent `python bench.py` (or CLI/server prove) on the same machine
skips all compiles — first-visit 2^22 drops from ~630 s to table-upload
plus run time.

Usage:  python tools/warm_cache.py [logn ...]     (default: all fixtures)
Exits nonzero if any prove fails; prints one line per size with the
cold-prove wall time (compiles included).
"""

import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from rapidsnark_tpu.utils import cache  # noqa: E402

cache.enable()


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fixdir = os.path.join(repo, "bench_fixtures")
    want = {int(a) for a in sys.argv[1:]} if len(sys.argv) > 1 else None
    sizes = []
    for f in glob.glob(os.path.join(fixdir, "sqchain*.zkey")):
        m = re.match(r"sqchain(\d+)$", os.path.basename(f)[:-len(".zkey")])
        if m:
            ln = int(m.group(1)).bit_length() - 1
            if want is None or ln in want:
                sizes.append(ln)
    if not sizes:
        print("no fixtures found (tools/gen_big_fixture.py writes them)")
        return 1

    from rapidsnark_tpu.io.wtns import read_wtns
    from rapidsnark_tpu.io.zkey import read_zkey
    from rapidsnark_tpu.prover import Prover

    rc = 0
    for ln in sorted(sizes):
        path = os.path.join(fixdir, f"sqchain{1 << ln}")
        t0 = time.time()
        prover = None
        try:
            zkey = read_zkey(path + ".zkey")
            prover = Prover(zkey)
            zkey.close()
            wit = read_wtns(path + ".wtns").values
            proof, _ = prover.prove(wit)
            assert proof.a and proof.b and proof.c  # on-curve points
            phases = {k: round(v, 2)
                      for k, v in prover.last_phases.items()}
            print(f"2^{ln}: warmed in {time.time() - t0:.0f}s "
                  f"phases={phases}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            done = dict(prover.last_phases) if prover is not None else {}
            print(f"2^{ln}: FAILED after {time.time() - t0:.0f}s "
                  f"(phases completed: {done}): {str(e)[:300]}",
                  flush=True)
            rc = 1
        finally:
            if prover is not None:
                # `del` alone cannot free the tables — the jit caches
                # hold the instance (static self); release() drops the
                # device arrays so the next rung starts with empty HBM
                prover.release()
    return rc


if __name__ == "__main__":
    sys.exit(main())
