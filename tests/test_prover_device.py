"""Device Groth16 prover vs the byte-level golden model.

The strongest claim this framework makes (SURVEY.md §3.1): given the same
(r, s), the TPU pipeline emits a proof *bit-identical* to the reference
C++ prover, and it verifies under the Groth16 pairing equation.
"""

import os

import pytest

from rapidsnark_tpu.io.wtns import read_wtns
from rapidsnark_tpu.io.zkey import read_zkey, zkey_to_ref
from rapidsnark_tpu.prover import Prover
from rapidsnark_tpu.ref.groth16 import prove as ref_prove, verify as ref_verify
from rapidsnark_tpu.utils.limbs import words_to_ints

from conftest import FIXTURES

R, S = 1234567890123456789012345678901234567890, 987654321098765432109876543210


def _run(fixture: str):
    zk = read_zkey(os.path.join(FIXTURES, f"{fixture}.zkey"))
    wt = read_wtns(os.path.join(FIXTURES, f"{fixture}.wtns"))
    prover = Prover(zk, window_bits=4)
    proof, publics = prover.prove(wt.values, r=R, s=S)

    ref_zk = zkey_to_ref(zk)
    witness = words_to_ints(wt.values)
    expect = ref_prove(ref_zk, witness, r=R, s=S)

    assert proof.a == expect.a, "pi_a mismatch"
    assert proof.b == expect.b, "pi_b mismatch"
    assert proof.c == expect.c, "pi_c mismatch"
    assert publics == witness[1:zk.n_public + 1]
    assert ref_verify(ref_zk, proof, publics)
    return prover


def test_prove_multiplier_bit_identical():
    _run("multiplier")


def test_prove_sqchain_bit_identical_and_phases():
    prover = _run("sqchain64")
    assert prover.last_phases["total"] > 0


def test_prove_sequential_ntt_bit_identical(monkeypatch):
    # RSTPU_NTT_SEQ forces the big-domain per-poly lax.map NTT path
    monkeypatch.setenv("RSTPU_NTT_SEQ", "1")
    prover = _run("sqchain64")
    assert prover.ntt_seq


def test_prove_random_rs_verifies():
    zk = read_zkey(os.path.join(FIXTURES, "multiplier.zkey"))
    wt = read_wtns(os.path.join(FIXTURES, "multiplier.wtns"))
    prover = Prover(zk, window_bits=4)
    p1, pub = prover.prove(wt.values)           # sampled r/s
    p2, _ = prover.prove(wt.values)
    assert p1.a != p2.a                          # randomized
    ref_zk = zkey_to_ref(zk)
    assert ref_verify(ref_zk, p1, pub) and ref_verify(ref_zk, p2, pub)


def test_wrong_curve_rejected(tmp_path):
    """main_prover.cpp:46-48: zkey for another curve must be rejected."""
    import numpy as np
    zk = read_zkey(os.path.join(FIXTURES, "multiplier.zkey"))
    zk.r = zk.r + 2
    with pytest.raises(ValueError, match="bn128"):
        Prover(zk, window_bits=4)


def test_release_frees_device_tables():
    """Prover.release() must drop every device-resident table even
    though the per-instance jit caches keep the object alive (static
    self) — the round-4 bench OOMed because `del prover` freed
    nothing. A released prover refuses further proves."""
    import jax

    zk = read_zkey(os.path.join(FIXTURES, "sqchain64.zkey"))
    wt = read_wtns(os.path.join(FIXTURES, "sqchain64.wtns"))
    prover = Prover(zk, window_bits=4)
    prover.prove(wt.values, r=R, s=S)
    table_ids = {id(a) for a in jax.live_arrays()
                 for leaf in jax.tree.leaves(prover.tables())
                 if a is leaf}
    assert table_ids, "tables should be live before release"
    prover.release()
    live = {id(a) for a in jax.live_arrays()}
    assert not (table_ids & live), "released tables still live"
    with pytest.raises(RuntimeError, match="release"):
        prover.tables()
