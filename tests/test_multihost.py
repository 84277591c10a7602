"""Multi-host (multi-process) prove: 2 CPU-simulated hosts x 4 virtual
devices == the byte-level golden model (SURVEY.md §4: multi-node
behavior tested via jax.distributed with local processes; BASELINE
config 5).

Runs in the DEFAULT suite (VERDICT r2 #5: multihost evidence must not
be opt-in): the two worker processes inherit RSTPU_CACHE, and
tools/build_cache_seed.py runs this test while building the committed
seed, so their pipeline compiles are cache hits on a fresh clone. Set
RSTPU_MULTIHOST=0 to opt out (e.g. single-run kernel experiments).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from conftest import FIXTURES

R, S = 31415926, 27182818


def _free_port() -> int:
    with socket.socket() as sk:
        sk.bind(("localhost", 0))
        return sk.getsockname()[1]


@pytest.mark.skipif(os.environ.get("RSTPU_MULTIHOST") == "0",
                    reason="RSTPU_MULTIHOST=0 opts out")
def test_two_process_prove_bit_identical(tmp_path):
    root = os.path.join(os.path.dirname(__file__), "..")
    worker = os.path.join(root, "tools", "dist_prove_worker.py")
    zk = os.path.join(FIXTURES, "sqchain64.zkey")
    wt = os.path.join(FIXTURES, "sqchain64.wtns")
    port = _free_port()

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port),
             zk, wt, str(tmp_path), str(R), str(S)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1500)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    proofs = [json.load(open(tmp_path / f"proof_{i}.json"))
              for i in range(2)]
    assert proofs[0] == proofs[1], "processes disagree"

    # vs the golden model
    from rapidsnark_tpu.io.wtns import read_wtns
    from rapidsnark_tpu.io.zkey import read_zkey, zkey_to_ref
    from rapidsnark_tpu.ref.groth16 import prove as ref_prove
    from rapidsnark_tpu.utils.limbs import words_to_ints

    zkd = read_zkey(zk)
    expect = ref_prove(zkey_to_ref(zkd),
                       words_to_ints(read_wtns(wt).values), r=R, s=S)
    got = proofs[0]
    assert got["pi_a"][:2] == [str(expect.a[0]), str(expect.a[1])]
    assert got["pi_c"][:2] == [str(expect.c[0]), str(expect.c[1])]
    assert got["pi_b"][0] == [str(expect.b[0][0]), str(expect.b[0][1])]
