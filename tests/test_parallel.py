"""Sharded MSM over a virtual 8-device mesh vs the single-device path.

The TPU-world analogue of multi-node testing without a cluster
(SURVEY.md §4): host-platform device virtualization via
xla_force_host_platform_device_count (set in conftest).
"""

import random

import numpy as np
import jax
from jax.sharding import Mesh

from rapidsnark_tpu.ops import msm as M
from rapidsnark_tpu.parallel import pmsm
from rapidsnark_tpu.ref import curve as refc
from rapidsnark_tpu.ref.field import R_FR
from rapidsnark_tpu.utils import points as PT
from rapidsnark_tpu.utils.limbs import ints_to_limbs

from test_curve_jax import _host_g1p

rng = random.Random(31)


def test_msm_sharded_matches_ref():
    ndev = len(jax.devices())
    assert ndev == 8, "conftest should provide 8 virtual devices"
    mesh = Mesh(np.array(jax.devices()), ("shard",))

    n = 40
    npad = pmsm.pad_len_sharded(n, ndev)
    pts = [refc.G1.mul(refc.G1_GEN, rng.randrange(1, R_FR))
           for _ in range(n)]
    pts[1] = None
    ks = [rng.randrange(R_FR) for _ in range(n)]
    ks[0] = 0

    arr = np.zeros((npad, 2, 16), np.uint32)
    arr[:n] = np.stack([PT.g1_affine_to_mont_limbs(p) for p in pts])
    x = jax.numpy.asarray(M.pack_limb_rows(np.moveaxis(arr[:, 0], -1, 0)))
    y = jax.numpy.asarray(M.pack_limb_rows(np.moveaxis(arr[:, 1], -1, 0)))
    from rapidsnark_tpu.ops.curve import G1P
    dev_pts = (x, y)  # packed affine pytree
    sc = M.pad_scalars(ints_to_limbs(ks), npad)

    out = jax.jit(
        lambda p, s: pmsm.msm_sharded(G1P, p, s, 4, mesh, combine=True)
    )(dev_pts, sc)
    got = _host_g1p(out)
    expect = refc.G1.msm(pts, ks)
    assert refc.G1.eq(got, expect)


def test_mesh_prover_bit_identical():
    """Full prove over the 8-device mesh (sharded MSM + all-to-all
    four-step NTT) == the byte-level golden model, bit for bit."""
    import os
    from conftest import FIXTURES
    from rapidsnark_tpu.io.wtns import read_wtns
    from rapidsnark_tpu.io.zkey import read_zkey, zkey_to_ref
    from rapidsnark_tpu.prover import Prover
    from rapidsnark_tpu.ref.groth16 import prove as ref_prove
    from rapidsnark_tpu.utils.limbs import words_to_ints

    mesh = Mesh(np.array(jax.devices()), ("shard",))
    zk = read_zkey(os.path.join(FIXTURES, "sqchain64.zkey"))
    wt = read_wtns(os.path.join(FIXTURES, "sqchain64.wtns"))
    prover = Prover(zk, window_bits=4, mesh=mesh)
    assert prover.dntt_plan is not None  # domain 128 splits over 8 devs
    r, s = 31415926, 27182818
    proof, pub = prover.prove(wt.values, r=r, s=s)
    expect = ref_prove(zkey_to_ref(zk), words_to_ints(wt.values), r=r, s=s)
    assert proof.a == expect.a and proof.b == expect.b \
        and proof.c == expect.c


def test_distributed_ntt_matches_single_device():
    """Four-step all-to-all NTT == the single-device kernel, both ways."""
    import jax.numpy as jnp
    from rapidsnark_tpu.ops import field as FF
    from rapidsnark_tpu.ops.ntt import NTTPlan, ntt
    from rapidsnark_tpu.parallel import pntt
    from rapidsnark_tpu.utils.limbs import ints_to_limbs

    ndev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("shard",))
    power = 8
    n = 1 << power
    vals = [rng.randrange(R_FR) for _ in range(n)]
    x = FF.unpack(jnp.asarray(ints_to_limbs(vals)))

    plan = pntt.DNTTPlan(power, ndev)
    arrays = plan.arrays()
    single = NTTPlan(power)

    fwd = jax.jit(lambda v: pntt.dntt(v, arrays, plan, mesh))(x)
    expect = ntt(x, {k: jnp.asarray(v) for k, v in
                     single.arrays().items()})
    assert np.array_equal(np.asarray(fwd), np.asarray(expect))

    back = jax.jit(
        lambda v: pntt.dntt(v, arrays, plan, mesh, inverse=True))(fwd)
    assert np.array_equal(np.asarray(back), np.asarray(x))
