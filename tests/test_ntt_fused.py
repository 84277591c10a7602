"""Fused-pass NTT (ops/fused.ntt_fused_pass) vs the per-stage path.

The fused path groups ALL butterfly stages into ceil((logN-11)/3)
Pallas passes; the per-stage path is the oracle-tested round-3 code
(tests/test_ntt_jax.py pins it to ref/ntt.py). Equality here is
BIT-EXACT on random stored-form inputs, covering: single-poly and
batched transforms, the ragged top group (2^15: one 1-stage pass on a
partially-used axis), and the coset-shift pre_mul fold (packed and
unpacked tables).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rapidsnark_tpu.ops.ntt import NTTPlan, to_odd_coset, ntt


def _rand(power, batch=()):
    rng = np.random.RandomState(power + 31 * len(batch))
    return jnp.asarray(rng.randint(
        0, 1 << 16, size=(16,) + batch + (1 << power,), dtype=np.uint32))


def _run(fn, x, fuse: bool):
    prev = os.environ.get("RSTPU_NTT_FUSE")
    os.environ["RSTPU_NTT_FUSE"] = "1" if fuse else "0"
    try:
        return np.asarray(jax.jit(fn)(x))
    finally:
        if prev is None:
            os.environ.pop("RSTPU_NTT_FUSE", None)
        else:
            os.environ["RSTPU_NTT_FUSE"] = prev


@pytest.mark.parametrize("power,batch", [(14, ()), (15, ()), (15, (3,))])
def test_fused_coset_pipeline_matches_per_stage(power, batch):
    plan = NTTPlan(power)
    arrays = {k: jnp.asarray(v) for k, v in plan.arrays().items()}
    x = _rand(power, batch)
    fn = lambda v: to_odd_coset(v, arrays, plan.eta)  # noqa: E731
    want = _run(fn, x, fuse=False)
    got = _run(fn, x, fuse=True)
    np.testing.assert_array_equal(got, want)


def test_fused_coset_packed_tables(power=14):
    """The prover stores fwd/inv/shift tables PACKED at 2^20+; the
    fused pass must unpack the pre_mul block and the stride-sliced
    twiddles identically."""
    from rapidsnark_tpu.ops.msm import pack_limb_rows

    plan = NTTPlan(power)
    arrays = {k: jnp.asarray(v) for k, v in plan.arrays().items()}
    packed = {k: pack_limb_rows(arrays[k])
              for k in ("fwd_tw", "inv_tw", "coset_ninv_br")}
    x = _rand(power)
    fn_ref = lambda v: to_odd_coset(v, arrays, plan.eta)  # noqa: E731
    fn_pk = lambda v: to_odd_coset(v, packed, plan.eta)   # noqa: E731
    want = _run(fn_ref, x, fuse=False)
    got = _run(fn_pk, x, fuse=True)
    np.testing.assert_array_equal(got, want)


def test_fused_plain_ntt_roundtrip(power=14):
    plan = NTTPlan(power)
    arrays = {k: jnp.asarray(v) for k, v in plan.arrays().items()}
    # roundtrip needs CANONICAL field elements (< r), unlike the
    # bit-exact path comparisons above: zero the top limb (< 2^240)
    x = jnp.asarray(np.asarray(_rand(power)) * (np.arange(16) != 15)
                    [:, None].astype(np.uint32))
    fwd = _run(lambda v: ntt(v, arrays), x, fuse=True)
    back = _run(lambda v: ntt(v, arrays, inverse=True),
                jnp.asarray(fwd), fuse=True)
    np.testing.assert_array_equal(back, np.asarray(x) % (2 ** 16))
