"""binfile / zkey / wtns format tests against committed fixtures."""

import os
import struct

import numpy as np
import pytest

from rapidsnark_tpu.io.binfile import BinFile, write_binfile
from rapidsnark_tpu.io.wtns import read_wtns, write_wtns
from rapidsnark_tpu.io.zkey import read_zkey, write_zkey, zkey_to_ref
from rapidsnark_tpu.ref import setup as S
from rapidsnark_tpu.ref.field import FR_CTX, P, R_FR
from rapidsnark_tpu.ref.groth16 import prove, verify
from rapidsnark_tpu.utils.limbs import words_to_ints

from conftest import FIXTURES


def test_binfile_roundtrip(tmp_path):
    path = str(tmp_path / "t.bin")
    write_binfile(path, "test", 3, [(1, b"abc"), (7, b"\x00" * 100), (1, b"x")])
    with BinFile(path, "test", 5) as f:
        assert f.version == 3
        assert bytes(f.section_bytes(1, 0)) == b"abc"
        assert bytes(f.section_bytes(1, 1)) == b"x"
        assert f.section_size(7) == 100


def test_binfile_type_and_version_checks(tmp_path):
    path = str(tmp_path / "t.bin")
    write_binfile(path, "test", 9, [])
    with pytest.raises(ValueError, match="Invalid file type"):
        BinFile(path, "zkey", 9)
    with pytest.raises(ValueError, match="Invalid version"):
        BinFile(path, "test", 8)


def test_wtns_roundtrip(tmp_path):
    path = str(tmp_path / "w.wtns")
    vals = [1, 42, R_FR - 1]
    write_wtns(path, vals)
    w = read_wtns(path)
    assert w.n8 == 32 and w.prime == R_FR and w.n_vars == 3
    assert words_to_ints(w.values) == vals


def test_zkey_fixture_parses():
    zk = read_zkey(os.path.join(FIXTURES, "multiplier.zkey"))
    assert zk.q == P and zk.r == R_FR
    assert zk.n_vars == 4 and zk.n_public == 1
    assert zk.domain_size == 4  # next_pow2(1 constraint + 1 public + 1)
    # coefs: 1 A-row entry + 2 public binding rows + 1 B-row entry
    assert zk.n_coefs == 4
    assert zk.points_a.shape == (4, 2, 8)
    assert zk.points_b2.shape == (4, 4, 8)
    assert zk.points_c.shape == (2, 2, 8)
    assert zk.points_h.shape == (4, 2, 8)


def test_zkey_coef_section_matches_reference_layout():
    """nCoefs = sectionSize/(12+n8r) and data starts at +4 (groth16.cpp:38)."""
    path = os.path.join(FIXTURES, "multiplier.zkey")
    with BinFile(path, "zkey", 1) as f:
        size = f.section_size(4)
        assert (size - 4) % 44 == 0
        (count,) = struct.unpack_from("<I", f.section_bytes(4), 0)
        assert count == size // 44  # integer division drops the +4


def test_zkey_roundtrip_prove_verify(tmp_path):
    """setup -> write -> read -> prove -> pairing-verify, from real files."""
    n = 8
    zk_data = S.setup(S.sqchain_r1cs(n), seed="io-test")
    path = str(tmp_path / "c.zkey")
    write_zkey(path, zk_data)
    rt = zkey_to_ref(read_zkey(path))

    # parsed tables must match the generating setup exactly
    assert rt.points_a == zk_data.points_a
    assert rt.points_h == zk_data.points_h
    assert rt.coefs == zk_data.coefs
    assert rt.vk_gamma2 == zk_data.vk_gamma2

    w = S.sqchain_witness(n, 5)
    proof = prove(rt, w, r=99, s=77)
    assert verify(rt, proof, w[1:2])


def test_fixture_wtns_satisfies_circuit():
    zk = zkey_to_ref(read_zkey(os.path.join(FIXTURES, "sqchain64.zkey")))
    w = words_to_ints(read_wtns(os.path.join(FIXTURES, "sqchain64.wtns")).values)
    proof = prove(zk, w, r=5, s=6)
    assert verify(zk, proof, w[1:2])


def test_coef_values_are_montgomery():
    zk = read_zkey(os.path.join(FIXTURES, "multiplier.zkey"))
    vals = words_to_ints(zk.coef_val)
    # all fixture coefficients are 1 or small negatives in plain form
    assert FR_CTX.from_mont(vals[0]) == 1


def test_zkey_close_and_context_manager():
    # close() unmaps the backing file; a context-managed read does the
    # same on exit (long-running services re-registering circuits must
    # not accumulate maps — divergence from the reference, which keeps
    # one malloc'd copy alive forever, binfile_utils.cpp:28-31)
    zk = read_zkey(os.path.join(FIXTURES, "sqchain64.zkey"))
    assert zk.file is not None
    zk.close()
    assert zk.file is None
    # the zero-copy table views were invalidated, not left dangling
    assert zk.points_a is None and zk.points_h is None
    zk.close()  # idempotent

    with read_zkey(os.path.join(FIXTURES, "sqchain64.zkey")) as zk2:
        assert zk2.n_vars > 0
    assert zk2.file is None


def test_zkey_close_pure_python_loader(monkeypatch):
    # the pure-Python BinFile path must close cleanly too: the mmap has
    # live numpy exports until ZKey.close() drops the table views —
    # without that, mmap.close() raises BufferError (advisor finding)
    monkeypatch.setenv("RSTPU_NATIVE", "0")
    from rapidsnark_tpu.io.binfile import BinFile

    zk = read_zkey(os.path.join(FIXTURES, "sqchain64.zkey"))
    assert isinstance(zk.file, BinFile)
    n_vars = zk.points_a.shape[0]
    zk.close()
    assert zk.file is None and zk.points_a is None
    assert n_vars == zk.n_vars


def test_zkey_close_after_prover_is_safe(monkeypatch):
    # the production sequence: build a Prover (repacks every table),
    # close the map, prove — both loader paths
    import numpy as np
    from rapidsnark_tpu.io.wtns import read_wtns
    from rapidsnark_tpu.prover import Prover
    from rapidsnark_tpu.ref.groth16 import verify

    monkeypatch.setenv("RSTPU_NATIVE", "0")
    path = os.path.join(FIXTURES, "sqchain64")
    zk = read_zkey(path + ".zkey")
    ref_zk = zkey_to_ref(zk)
    prover = Prover(zk, window_bits=4)
    zk.close()
    wit = read_wtns(path + ".wtns").values
    proof, publics = prover.prove(np.asarray(wit), r=11, s=22)
    assert verify(ref_zk, proof, publics)
