#!/usr/bin/env python3
"""Generate committed test fixtures: toy .zkey/.wtns pairs.

Circuits (see rapidsnark_tpu/ref/setup.py):
  multiplier      — 1 constraint, domain 4        (smoke / byte-level tests)
  sqchain64       — 64-step square chain, domain 128 (end-to-end prove tests)

The setup is deterministic (seeded toxic waste) so regenerating produces
identical bytes. Verified at generation time with the pure-Python pairing.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rapidsnark_tpu.io.zkey import write_zkey, read_zkey, zkey_to_ref
from rapidsnark_tpu.io.wtns import write_wtns
from rapidsnark_tpu.ref import setup as S
from rapidsnark_tpu.ref.groth16 import prove, verify

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def gen(name: str, r1cs, witness):
    os.makedirs(FIXDIR, exist_ok=True)
    zk = S.setup(r1cs, seed=f"rapidsnark-tpu-{name}")
    zkey_path = os.path.join(FIXDIR, f"{name}.zkey")
    wtns_path = os.path.join(FIXDIR, f"{name}.wtns")
    write_zkey(zkey_path, zk)
    write_wtns(wtns_path, witness)

    # round-trip + end-to-end validation before committing the fixture
    rt = zkey_to_ref(read_zkey(zkey_path))
    proof = prove(rt, witness, r=0x1234, s=0x5678)
    assert verify(rt, proof, witness[1:r1cs.n_public + 1]), f"{name}: proof failed"
    print(f"{name}: zkey {os.path.getsize(zkey_path)}B, "
          f"wtns {os.path.getsize(wtns_path)}B, verified OK")


def main():
    gen("multiplier", S.multiplier_r1cs(), S.multiplier_witness(3, 5))
    n = 64
    gen("sqchain64", S.sqchain_r1cs(n), S.sqchain_witness(n, 7))


if __name__ == "__main__":
    main()
