#!/usr/bin/env python3
"""Instrumented 2^24 prove: live-buffer accounting per stage (dev)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from rapidsnark_tpu.utils import cache  # noqa: E402

cache.enable()

import numpy as np  # noqa: E402
import jax  # noqa: E402


def live(tag):
    tot = sum(a.nbytes for a in jax.live_arrays())
    line = f"[{tag}] live arrays: {tot/2**30:.2f} GiB"
    try:
        ms = jax.local_devices()[0].memory_stats()
        if ms:
            line += (f"; device in_use={ms.get('bytes_in_use', 0)/2**30:.2f}"
                     f" peak={ms.get('peak_bytes_in_use', 0)/2**30:.2f}"
                     f" limit={ms.get('bytes_limit', 0)/2**30:.2f} GiB")
    except Exception as e:  # noqa: BLE001
        line += f"; memory_stats: {type(e).__name__}"
    print(line, flush=True)


def main():
    from rapidsnark_tpu.io.wtns import read_wtns
    from rapidsnark_tpu.io.zkey import read_zkey
    from rapidsnark_tpu import prover as PV

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "bench_fixtures", "sqchain16777216")
    t0 = time.time()
    zkey = read_zkey(path + ".zkey")
    p = PV.Prover(zkey)
    zkey.close()
    print(f"constructed in {time.time()-t0:.0f}s: c={p.c_bits} "
          f"G={p.window_group} seg={p.segment}", flush=True)
    live("post-construction")
    wit = read_wtns(path + ".wtns").values

    import jax.numpy as jnp
    witness = jnp.asarray(np.asarray(wit, dtype=np.uint32))
    tables = p.tables()
    t0 = time.time()
    rows = p._front_staged(witness, tables)
    jax.block_until_ready(rows)
    print(f"front: {time.time()-t0:.0f}s", flush=True)
    del witness
    live("post-front")
    fx = PV._fmt(PV._MTM_PTS_X) if p.pin_layouts else None
    fy = PV._fmt(PV._MTM_PTS_Y) if p.pin_layouts else None
    for b in range(2):
        t0 = time.time()
        try:
            blk = tables["pts_g1"][b]
            if p.paged:
                blk = (PV._unpark(blk[0], fx), PV._unpark(blk[1], fy))
            out = PV._msm_g1_block(blk, rows,
                                   jnp.int32(b), c_bits=p.c_bits,
                                   window_group=p.window_group,
                                   segment=p.segment, pin=p.pin_layouts)
            out = [np.asarray(leaf) for leaf in out]
            del blk
            print(f"g1 block {b} OK: {time.time()-t0:.0f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"g1 block {b} FAILED after {time.time()-t0:.0f}s: "
                  f"{str(e)[:200]}", flush=True)
            live(f"post-g1b{b}-fail")
            return 1
        live(f"post-g1b{b}")
    t0 = time.time()
    try:
        g2 = tables["pts_g2"]
        if p.paged:
            g2 = PV._unpark(g2, fx)
        g2w = PV._msm_g2_stage(g2, rows, c_bits=p.c_bits,
                               window_group=p.window_group,
                               segment=p.segment, pin=p.pin_layouts)
        g2w = jax.tree.map(np.asarray, g2w)
        print(f"g2 stage OK: {time.time()-t0:.0f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"g2 stage FAILED after {time.time()-t0:.0f}s: "
              f"{str(e)[:200]}", flush=True)
        live("post-g2-fail")
        return 1
    live("post-g2")
    print("BOTH MSM STAGES OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
