"""Prototype: Pallas DMA row-gather vs XLA take on TPU.

XLA's TPU gather lowering moves ~2 GB/s on 64-byte rows (issue-bound,
tools/bench_gather.py). This prototype issues one async DMA per row from
an HBM-resident row-major table, `nsem` outstanding copies at a time —
the embedding-lookup pattern from the Pallas guide — to measure the
achievable issue rate.

Usage: python tools/bench_dma_gather.py [logn] [rowwords] [blk] [nsem]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from rapidsnark_tpu.utils import cache  # noqa: E402

cache.enable()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


@functools.partial(jax.jit, static_argnames=("blk", "nsem"))
def dma_gather(table, idx, blk: int = 512, nsem: int = 16):
    """table: (n, R) u32 rows in HBM; idx: (m,) int32 -> (m, R)."""
    m = idx.shape[0]
    R = table.shape[1]
    assert m % blk == 0 and blk % nsem == 0

    def kernel(idx_ref, tbl_ref, out_ref, sems):
        def wave(w, _):
            base = w * nsem
            for j in range(nsem):
                row = idx_ref[base + j]
                pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(row, 1)],
                    out_ref.at[pl.ds(base + j, 1)],
                    sems.at[j],
                ).start()
            for j in range(nsem):
                pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(0, 1)],
                    out_ref.at[pl.ds(base + j, 1)],
                    sems.at[j],
                ).wait()
            return _

        jax.lax.fori_loop(0, blk // nsem, wave, 0)

    return pl.pallas_call(
        kernel,
        grid=(m // blk,),
        in_specs=[
            pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((blk, R), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, R), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nsem,))],
    )(idx, table)


def timeit(f, args, reps, K=4):
    @jax.jit
    def run(t, p):
        n = t.shape[0]

        def step(i, acc):
            return acc ^ f(t, (p + i) % n)

        return jax.lax.fori_loop(1, K, step, f(t, p))[..., :1]

    r = run(*args)
    np.asarray(r)[:1]
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(*args))[:1]
        times.append(time.perf_counter() - t0)
    return min(times) / K


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    blk = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    nsem = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    n = 1 << logn
    rng = np.random.RandomState(0)
    table = jnp.asarray(
        rng.randint(0, 2**31, size=(n, R), dtype=np.int64).astype(np.uint32))
    idx = jnp.asarray(rng.permutation(n).astype(np.int32))

    ok = np.array_equal(np.asarray(dma_gather(table, idx, blk=blk,
                                              nsem=nsem)),
                        np.asarray(table)[np.asarray(idx)])
    print(f"correct: {ok}")
    gb = n * R * 4 / 1e9
    dt = timeit(lambda t, p: dma_gather(t, p, blk=blk, nsem=nsem),
                (table, idx), 4)
    print(f"dma  blk={blk} nsem={nsem}: {dt*1e3:8.2f} ms  {gb/dt:7.2f} GB/s"
          f"  {n/dt/1e6:6.1f} Mrows/s")
    dt = timeit(lambda t, p: jnp.take(t, p, axis=0), (table, idx), 4)
    print(f"xla  take                : {dt*1e3:8.2f} ms  {gb/dt:7.2f} GB/s"
          f"  {n/dt/1e6:6.1f} Mrows/s")


if __name__ == "__main__":
    main()
