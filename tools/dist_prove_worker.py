#!/usr/bin/env python3
"""One process of a multi-host prove job (CPU-simulation worker).

Usage: dist_prove_worker.py <proc_id> <nprocs> <port> <zkey> <wtns>
           <outdir> [r] [s]

Simulates one "host" with 4 virtual CPU devices (SURVEY.md §4 strategy:
test multi-node without a cluster); N workers form a 4N-device global
mesh via jax.distributed and run the standard mesh prover. Each worker
writes proof_<i>.json / public_<i>.json — all processes must produce
identical output.
"""

import json
import os
import sys

proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
zkey_path, wtns_path, outdir = sys.argv[4], sys.argv[5], sys.argv[6]
r = int(sys.argv[7]) if len(sys.argv) > 7 else None
s = int(sys.argv[8]) if len(sys.argv) > 8 else None

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from rapidsnark_tpu.utils import cache  # noqa: E402

cache.enable()

from rapidsnark_tpu.parallel import multihost  # noqa: E402

multihost.initialize(coordinator=f"localhost:{port}",
                     num_processes=nprocs, process_id=proc_id)

import jax  # noqa: E402

assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 4 * nprocs

from rapidsnark_tpu.io.wtns import read_wtns  # noqa: E402
from rapidsnark_tpu.io.zkey import read_zkey  # noqa: E402
from rapidsnark_tpu.prover import Prover  # noqa: E402

mesh = multihost.global_mesh()
prover = Prover(read_zkey(zkey_path), window_bits=4, mesh=mesh)
proof, publics = prover.prove(read_wtns(wtns_path).values, r=r, s=s)

with open(os.path.join(outdir, f"proof_{proc_id}.json"), "w") as f:
    json.dump(proof.to_json_dict(), f)
with open(os.path.join(outdir, f"public_{proc_id}.json"), "w") as f:
    json.dump([str(v) for v in publics], f)
print(f"proc {proc_id}: OK", flush=True)
