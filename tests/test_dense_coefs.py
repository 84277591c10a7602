"""Coefficient rows denser than one segment_sum pass tolerates.

The reference's striped-lock scatter (groth16.cpp:63-85) handles any
number of terms on one evaluation row; the device accumulation sums
16-bit limbs in u32 columns, which caps ONE pass at 2^15 terms per row.
Rows above the cap must route through the two-level pass
(prover.Prover coef table setup) and still prove bit-identically.
"""

import dataclasses
import os
import random

import numpy as np

from rapidsnark_tpu.io.wtns import read_wtns
from rapidsnark_tpu.io.zkey import read_zkey, zkey_to_ref
from rapidsnark_tpu.prover import Prover
from rapidsnark_tpu.ref.field import R_FR
from rapidsnark_tpu.ref.groth16 import prove as ref_prove
from rapidsnark_tpu.utils.limbs import words_to_ints

from conftest import FIXTURES

rng = random.Random(91)


def _int_to_words(v: int) -> np.ndarray:
    return np.frombuffer(v.to_bytes(32, "little"), dtype="<u4").copy()


def _split_record(zk, idx: int, k: int):
    """Replace coef record idx with k records of the same (m, c, s)
    whose Montgomery values sum to the original (Montgomery form is
    additive: mont(a) + mont(b) = mont(a+b) mod r), so the linear
    combination — and therefore the proof — is unchanged."""
    orig = words_to_ints(zk.coef_val[idx:idx + 1])[0]
    parts = [rng.randrange(R_FR) for _ in range(k - 1)]
    parts.append((orig - sum(parts)) % R_FR)
    vals = np.stack([_int_to_words(v) for v in parts])
    rep = lambda a, fill: np.concatenate(  # noqa: E731
        [a[:idx], fill, a[idx + 1:]], axis=0)
    return dataclasses.replace(
        zk,
        n_coefs=zk.n_coefs + k - 1,
        coef_m=rep(zk.coef_m, np.full(k, zk.coef_m[idx], np.uint32)),
        coef_c=rep(zk.coef_c, np.full(k, zk.coef_c[idx], np.uint32)),
        coef_s=rep(zk.coef_s, np.full(k, zk.coef_s[idx], np.uint32)),
        coef_val=rep(zk.coef_val, vals),
    )


def test_dense_row_two_level_accumulation_bit_identical():
    zk = read_zkey(os.path.join(FIXTURES, "multiplier.zkey"))
    wt = read_wtns(os.path.join(FIXTURES, "multiplier.wtns"))
    dense = _split_record(zk, 0, (1 << 15) + 700)  # one row over the cap

    prover = Prover(dense, window_bits=4)
    assert prover.acc2_seg is not None  # two-level path engaged

    r, s = 1122334455, 9988776655
    proof, publics = prover.prove(wt.values, r=r, s=s)
    expect = ref_prove(zkey_to_ref(dense), words_to_ints(wt.values),
                       r=r, s=s)
    assert proof.a == expect.a and proof.b == expect.b \
        and proof.c == expect.c


def test_sparse_rows_stay_scatter_free():
    """Typical (sparse) rows bin fully into the K host-side slots: the
    device accumulation is a pure reshape-reduce with NO segment_sum."""
    zk = read_zkey(os.path.join(FIXTURES, "multiplier.zkey"))
    prover = Prover(zk, window_bits=4)
    assert prover.left_s is None       # nothing spilled
    assert prover.acc2_seg is None
    assert prover.coef_slots <= 16


def test_mid_density_rows_spill_to_segment_sum():
    """Rows denser than the slot count (but under the 2^15 carry cap)
    spill to the single-pass leftover segment_sum and still prove
    bit-identically."""
    zk = read_zkey(os.path.join(FIXTURES, "multiplier.zkey"))
    wt = read_wtns(os.path.join(FIXTURES, "multiplier.wtns"))
    dense = _split_record(zk, 0, 100)  # > 16 slots, < 2^15 cap

    prover = Prover(dense, window_bits=4)
    assert prover.left_s is not None   # leftover pass engaged
    assert prover.acc2_seg is None     # but not the two-level pass

    r, s = 456, 789
    proof, publics = prover.prove(wt.values, r=r, s=s)
    expect = ref_prove(zkey_to_ref(dense), words_to_ints(wt.values),
                       r=r, s=s)
    assert proof.a == expect.a and proof.b == expect.b \
        and proof.c == expect.c
