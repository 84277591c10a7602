"""CLI prover with the reference's exact 4-argument contract.

Mirrors /root/reference/src/main_prover.cpp:23-103: same usage string,
same error strings for curve mismatches, same output artifacts —
`proof.json` (Proof::toJson shape, groth16.cpp:268-301) and `public.json`
(array of decimal public-signal strings, main_prover.cpp:85-93).

    python -m rapidsnark_tpu.cli <circuit.zkey> <witness.wtns> \
        <proof.json> <public.json>
"""

from __future__ import annotations

import json
import sys
from typing import Optional, Sequence

from .ref.field import R_FR

USAGE = ("Invalid number of parameters:\n"
         "Usage: prover <circuit.zkey> <witness.wtns> "
         "<proof.json> <public.json>\n")


def run_prove(zkey_path: str, wtns_path: str, proof_path: str,
              public_path: str, r: Optional[int] = None,
              s: Optional[int] = None, window_bits: Optional[int] = None,
              ) -> None:
    from .utils import cache
    cache.enable()
    from .io.wtns import read_wtns
    from .io.zkey import read_zkey
    from .prover import Prover

    zkey = read_zkey(zkey_path)
    if zkey.r != R_FR:
        raise ValueError("zkey curve not supported")  # main_prover.cpp:47

    wtns = read_wtns(wtns_path)
    if wtns.prime != R_FR:
        raise ValueError("different wtns curve")      # main_prover.cpp:54

    # Sharded / multi-host execution (a capability the reference lacks;
    # its CLI contract stays untouched — config rides env knobs):
    #   RSTPU_SHARD=1                shard over every local device
    #   RSTPU_NPROCS/RSTPU_PROC_ID/RSTPU_COORD
    #                                multi-process (jax.distributed);
    #                                every process runs this same CLI
    import os
    mesh = None
    if os.environ.get("RSTPU_NPROCS") or os.environ.get("RSTPU_COORD"):
        from .parallel import multihost
        multihost.initialize()
        mesh = multihost.global_mesh()
    elif os.environ.get("RSTPU_SHARD", "0") != "0":
        import jax
        import numpy as np
        from jax.sharding import Mesh
        if len(jax.devices()) > 1:
            mesh = Mesh(np.array(jax.devices()), ("shard",))

    prover = Prover(zkey, window_bits=window_bits, mesh=mesh)
    zkey.close()  # tables are repacked on device; drop the file map
    proof, publics = prover.prove(wtns.values)

    # Byte-exact output: the reference streams nlohmann::json objects with
    # default stream width (main_prover.cpp:77-93) — compact separators, no
    # trailing newline. A default-constructed nlohmann json (nPublic = 0)
    # prints "null".
    with open(proof_path, "w") as f:
        f.write(json.dumps(proof.to_json_dict(), separators=(",", ":")))
    with open(public_path, "w") as f:
        pub = [str(v) for v in publics]
        f.write(json.dumps(pub, separators=(",", ":")) if pub else "null")


def main(argv: Optional[Sequence[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 4:
        sys.stderr.write(USAGE)
        return 255  # the reference returns -1 (main_prover.cpp:28)
    try:
        run_prove(*argv)
    except Exception as e:  # main_prover.cpp:97-101 catches everything
        sys.stderr.write(f"{e}\n")
        return 255
    return 0


if __name__ == "__main__":
    sys.exit(main())
