#!/usr/bin/env python3
"""Export a snarkjs-format verification_key.json from a .zkey.

This closes the external-oracle loop documented in PARITY.md: this image
has no node/snarkjs and no egress, so the in-repo oracle is the
pure-Python pairing verifier (tools/verify_proof.py). Any node-equipped
machine can cross-check the SAME artifacts against real snarkjs:

    python tools/export_vkey.py circuit.zkey verification_key.json
    snarkjs groth16 verify verification_key.json public.json proof.json

The JSON shape matches `snarkjs zkey export verificationkey` for the
fields groth16 verification reads (vk_alpha_1, vk_beta_2, vk_gamma_2,
vk_delta_2, IC; snarkjs's verifier recomputes the pairing from these —
the cached vk_alphabeta_12 field is not required and is omitted).

Reference parity: the zkey vk points live in section 2 and the IC
points in section 3 (/root/reference/src/zkey_utils.cpp:29-47;
io/zkey.py docstring).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def vkey_dict(zkey_path: str) -> dict:
    from rapidsnark_tpu.io.zkey import read_zkey
    from rapidsnark_tpu.ref.field import FQ_CTX
    from rapidsnark_tpu.utils.limbs import limbs_to_ints, words_to_ints

    zk = read_zkey(zkey_path)
    if zk.ic is None:
        raise ValueError("zkey has no IC section (section 3) — "
                         "cannot build a verification key")

    def g1(vals):
        x, y = (FQ_CTX.from_mont(v) for v in vals)
        if x == 0 and y == 0:
            return ["0", "1", "0"]  # snarkjs projective infinity
        return [str(x), str(y), "1"]

    def g2(vals):
        x0, x1, y0, y1 = (FQ_CTX.from_mont(v) for v in vals)
        if x0 == x1 == y0 == y1 == 0:
            return [["0", "0"], ["1", "0"], ["0", "0"]]
        return [[str(x0), str(x1)], [str(y0), str(y1)], ["1", "0"]]

    ic = [g1(words_to_ints(p)) for p in zk.ic]
    vk = {
        "protocol": "groth16",
        "curve": "bn128",
        "nPublic": zk.n_public,
        "vk_alpha_1": g1(limbs_to_ints(zk.vk_alpha1)),
        "vk_beta_2": g2(limbs_to_ints(zk.vk_beta2)),
        "vk_gamma_2": g2(limbs_to_ints(zk.vk_gamma2)),
        "vk_delta_2": g2(limbs_to_ints(zk.vk_delta2)),
        "IC": ic,
    }
    zk.close()
    return vk


def main() -> int:
    if len(sys.argv) not in (2, 3):
        sys.stderr.write("Usage: python tools/export_vkey.py <circuit.zkey> "
                         "[verification_key.json]\n")
        return 255
    vk = vkey_dict(sys.argv[1])
    out = sys.argv[2] if len(sys.argv) == 3 else "verification_key.json"
    with open(out, "w") as f:
        json.dump(vk, f, indent=1)
    print(f"wrote {out} (nPublic={vk['nPublic']}, |IC|={len(vk['IC'])})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
