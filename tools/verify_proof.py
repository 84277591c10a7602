#!/usr/bin/env python3
"""Verify a proof.json/public.json pair against a zkey (pairing check).

The snarkjs-oracle role (SURVEY.md §4) without node: uses the pure-Python
Groth16 verifier (rapidsnark_tpu.ref.groth16.verify). A proof accepted
here satisfies e(A,B) = e(alpha,beta) e(vk_x,gamma) e(C,delta) with the
zkey's own verifying points, i.e. would verify under snarkjs.

Usage: python tools/verify_proof.py <circuit.zkey> <proof.json> <public.json>
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main(argv):
    if len(argv) != 3:
        sys.stderr.write("Usage: python tools/verify_proof.py <circuit.zkey> "
                         "<proof.json> <public.json>\n")
        return 1
    zkey_path, proof_path, public_path = argv

    from rapidsnark_tpu.io.zkey import read_zkey, zkey_to_ref
    from rapidsnark_tpu.ref.groth16 import Proof, verify

    with open(proof_path) as f:
        pj = json.load(f)
    with open(public_path) as f:
        publics = [int(v) for v in json.load(f)]

    proof = Proof(
        a=(int(pj["pi_a"][0]), int(pj["pi_a"][1])),
        b=((int(pj["pi_b"][0][0]), int(pj["pi_b"][0][1])),
           (int(pj["pi_b"][1][0]), int(pj["pi_b"][1][1]))),
        c=(int(pj["pi_c"][0]), int(pj["pi_c"][1])),
    )
    zk = zkey_to_ref(read_zkey(zkey_path))
    if zk.ic is None or not zk.ic:
        sys.stderr.write("zkey has no IC section (section 3): cannot "
                         "verify\n")
        return 1
    ok = verify(zk, proof, publics)
    print("verified OK" if ok else "VERIFICATION FAILED")
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
